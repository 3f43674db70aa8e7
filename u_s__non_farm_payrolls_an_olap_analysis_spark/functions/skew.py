"""Skew-mitigation utilities: key salting for hot-key joins/aggregations.

AQE's skew-join splitting handles most skew transparently (enabled in
``session.py``); explicit salting remains the tool when one side must be
aggregated first or when a groupBy key is pathologically hot (e.g. the
``events.user_id`` power users at 100 TB). The pattern:

    fact:  key -> (key, salt = hash(row) % N)
    dim:   key -> exploded to (key, salt) for all N salts
    join on (key, salt) — the hot key's rows spread over N tasks.

For aggregation: two-phase — groupBy(key, salt) partial, then groupBy(key)
final. Associative aggregates only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hashable(dtype) -> bool:
    """xxhash64 rejects MapType at any nesting depth — filter those out."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dtype, MapType):
        return False
    if isinstance(dtype, ArrayType):
        return _hashable(dtype.elementType)
    if isinstance(dtype, StructType):
        return all(_hashable(f.dataType) for f in dtype.fields)
    return True


def with_salt(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Add a uniform salt derived from a whole-row hash (deterministic for
    a given row, no RNG — keeps retries/replays stable).

    Map-typed columns (at any nesting depth) are excluded from the hash —
    Spark's hash functions don't support maps. If NO column is hashable,
    falls back to ``monotonically_increasing_id`` (still spreads rows, but
    partition-layout-dependent rather than content-deterministic).

    Known limitation (documented, inherent to content hashing): byte-equal
    duplicate rows collide into one salt bucket, so a hot key consisting of
    *identical* rows is not spread — dedup first, or salt on
    ``monotonically_increasing_id`` explicitly for that shape.
    """
    cols = [f.name for f in df.schema.fields if _hashable(f.dataType)]
    basis = F.xxhash64(*cols) if cols else F.monotonically_increasing_id()
    return df.withColumn(col_name, F.pmod(basis, F.lit(n_salts)).cast("int"))


def explode_salts(df: DataFrame, n_salts: int, col_name: str = "__salt") -> DataFrame:
    """Replicate the (small) side once per salt value so the salted
    equi-join covers every (key, salt) bucket."""
    return df.withColumn(
        col_name,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )


# Join types where replicating the small side cannot duplicate output rows:
# unmatched SMALL rows are never emitted by these. right/full would emit each
# unmatched small row once per salt — silently wrong — so they are rejected.
_SALT_SAFE_JOINS = {
    "inner", "left", "leftouter", "left_outer",
    "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti",
}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated:
    a hot key's probe rows fan out over ``n_salts`` tasks instead of one
    straggler. Cost: small side x n_salts (bounded, it's the small side).

    Only join types that never emit unmatched small-side rows are allowed
    (the replication would duplicate them ``n_salts`` times otherwise)."""
    if how.lower().replace("_", "") not in {
        j.replace("_", "") for j in _SALT_SAFE_JOINS
    }:
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would duplicate unmatched rows; use inner/left/"
            "semi/anti, or salt the other side"
        )
    b = with_salt(big, n_salts)
    s = explode_salts(small, n_salts)
    joined = b.join(s, on=on + ["__salt"], how=how)
    return joined.drop("__salt")


def salted_count_by_key(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation under a hot groupBy key: partial counts per
    (key, salt) — spread across tasks — then the cheap final merge per key."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))
