"""Join operators (SURVEY §2.10 X1–X4).

The reference is single-table (SURVEY §2.3) — its only join shapes are the
implicit self-as-of of the recovery analysis (J1, in ``olap.py``). These
operators add the explicit join surface a star schema needs, each chosen for
its 100 TB physical strategy:

- X1: fact x small dim → **broadcast hash join** (no shuffle of the fact).
- X2: 3-way star join → shuffle join on the fact key with broadcast dims;
  AQE demotes/promotes strategies at runtime.
- X3: semi/anti → ``left_semi`` / ``left_anti`` (no payload duplication,
  no row explosion — unlike an outer-join-and-filter formulation).
- X4: as-of (nearest prior order per event) → the union-timeline pattern:
  one shuffle on the join key, a single ordered window, **no range
  explosion** — the scalable alternative to a non-equi join whose
  intermediate is |events| x |orders per user|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numerics import dsum, dsum_sql, dround
from ..functions.timeparts import epoch_micros_from_ntz
from ..functions.plan_cache import plan_memo
from ..io import read_table


def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — orders x customer with an explicit broadcast hint: the fact
    table never shuffles; each task hash-probes the dim in memory."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(customer),
            orders.o_custkey == customer.c_custkey,
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum("o_totalprice"), 4).alias("total"),
        )
    )


@plan_memo
def join_shuffle_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — orders ⋈ customer ⋈ nation, aggregated per nation. customer is
    mid-size (shuffle or broadcast per AQE's runtime stats); nation is tiny
    and always broadcast."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum("o_totalprice"), 4).alias("total"),
        )
    )


def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — per nation, how many customers have / don't have orders.
    ``left_semi`` / ``left_anti`` keep only the left side's columns and
    never duplicate rows — the physical plans stop probing on first match."""
    customer = read_table(spark, sf_dir, "customer")
    orders = read_table(spark, sf_dir, "orders").select("o_custkey")
    nation = read_table(spark, sf_dir, "nation")
    semi = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .select("c_nationkey")
        .withColumn("has_orders", F.lit(1))
    )
    anti = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_nationkey")
        .withColumn("has_orders", F.lit(0))
    )
    return (
        semi.unionByName(anti)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum("has_orders").alias("n_with_orders"),
            F.sum(1 - F.col("has_orders")).alias("n_without_orders"),
        )
    )


def join_bitmap_prefiltered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """North-star — broadcast BITMAP semi-join: yearly order volume for
    one market segment's customers, with the fact side filtered by an
    exact key bitmap instead of a join hash relation. The filtered dim's
    keys fold into a (word -> 64-bit mask) table via ``bit_or`` (8 bytes
    per 64 keys of key DOMAIN — a 1e9-key dense id space is ~125 MB,
    broadcastable when the dim's hash relation with payload is not);
    each fact row probes its word with one shift-and-mask. The bitmap is
    EXACT over integer keys, so the probe IS the semi-join — no fact
    shuffle, no per-row hash table, and the dim payload is never
    shipped. For SPARSE key domains the same shape degrades gracefully
    to a lossy bloom (hash the key into k positions, verify with the
    real join) — Catalyst's own InjectRuntimeFilter form of that is
    demonstrated at engine defaults in tests/test_scale_patterns.py;
    this operator keeps the always-on exact variant under engine
    control."""
    orders = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_totalprice", "o_orderdate"
    )
    bits = (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(
            F.expr("c_custkey div 64").alias("word"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(c_custkey % 64 AS INT))"
            ).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    pre = (
        orders.withColumn("word", F.expr("o_custkey div 64"))
        # inner join: a fact word with NO dim keys has no bitmap row and
        # is dropped outright — the coarse first level of the filter
        .join(F.broadcast(bits), "word")
        .filter(
            F.expr(
                "shiftright(bits, CAST(o_custkey % 64 AS INT)) & 1"
            )
            == 1
        )
    )
    return (
        pre.groupBy(F.year("o_orderdate").cast("int").alias("year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(dsum("o_totalprice"), 4).alias("total"),
        )
        .orderBy("year")
    )


def join_range_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 — for each event, the most recent order at-or-before the event
    time for the same user (generalizes the reference's recovery as-of, J1).

    Union-timeline formulation: interleave orders and events into one
    stream per user, sort by time, and carry the last seen order timestamp
    forward with ``last_value(ignoreNulls)``. Exactly one shuffle (by
    user), no quadratic candidate set — at 100 TB the non-equi-join
    formulation (every event x every earlier order) would explode; this one
    is linear in |events| + |orders|.
    """
    orders = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderdate").alias("order_ts"),
    )
    events = read_table(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("order_ts"),
    )
    # Order ties: order rows sort before event rows at equal t (is_event
    # ascending), and concurrent orders sort by order_ts so the carried
    # value is the MAX prior order — matching the oracle's MAX().
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_event", "order_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    timeline = orders.unionByName(events).withColumn(
        "last_order_ts", F.last("order_ts", ignorenulls=True).over(w)
    )
    return timeline.filter(F.col("is_event") == 1).select(
        "event_id", "user_id", "last_order_ts"
    )


ASOF_NEAREST_TOL_US = 86_400 * 1_000_000  # 24-hour match tolerance


def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction=NEAREST with tolerance (the pandas
    ``merge_asof(direction='nearest')`` / kdb ``wj`` shape): for each
    purchase, the closest same-user CLICK timestamp within 24 hours, in
    either direction — ties broken toward the past. (The fixture's
    median purchase→nearest-click gap is ~18 h, so the tolerance drops
    a real tail rather than matching everything.)

    Same union-timeline trick as ``join_range_asof`` run in BOTH
    directions: one shuffle on user, two complementary unbounded window
    frames carry the last click at-or-before and the first click after,
    then the nearest pick is a per-row comparison of exact int64
    microsecond gaps (pure-arithmetic epoch math, rule 6a — no
    tz-dependent casts). Linear in |events|; the naive formulation
    (every purchase x every candidate click within tolerance) is what
    the DuckDB oracle runs, which this must equal."""
    ev = read_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("timestamp_ntz").alias("click_ts"),
    )
    # click rows sort before purchase rows at equal t, so an equal-t
    # click lands in the BACKWARD frame (gap 0), matching the oracle's
    # `click_ts <= purchase_ts -> backward` convention
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_probe", "click_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "is_probe", "click_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    en = (
        clicks.unionByName(purchases)
        .select(
            "user_id",
            "t",
            "is_probe",
            "event_id",
            F.last("click_ts", ignorenulls=True).over(wb).alias("prev_ts"),
            F.first("click_ts", ignorenulls=True).over(wf).alias("next_ts"),
        )
        .filter(F.col("is_probe") == 1)
    )
    tol = F.lit(ASOF_NEAREST_TOL_US)
    db = epoch_micros_from_ntz("t") - epoch_micros_from_ntz("prev_ts")
    df_ = epoch_micros_from_ntz("next_ts") - epoch_micros_from_ntz("t")
    # backward wins when in tolerance and no strictly-closer forward hit;
    # null gaps (missing neighbor) fail every comparison and fall through
    pick_back = (db <= tol) & (
        F.col("next_ts").isNull() | (df_ > tol) | (db <= df_)
    )
    nearest = F.when(pick_back, F.col("prev_ts")).when(
        df_ <= tol, F.col("next_ts")
    )
    direction = F.when(pick_back, F.lit("backward")).when(
        df_ <= tol, F.lit("forward")
    )
    gap = F.when(pick_back, db).when(df_ <= tol, df_)
    return (
        en.select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("t").alias("purchase_ts"),
            nearest.alias("nearest_click_ts"),
            direction.alias("direction"),
            gap.alias("gap_us"),
        )
        .filter(F.col("nearest_click_ts").isNotNull())
        .orderBy("purchase_id")
    )


def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded interval self-join: for each purchase, how many clicks the
    same user made in the preceding hour.

    The scalable formulation: the interval length (1 h) bounds the search
    to the purchase's hour bucket and the one before it, so each click is
    **exploded to exactly two (user, bucket) keys** and the join is a pure
    equi-join on (user_id, bucket) followed by the exact range filter —
    candidate count is O(events in adjacent buckets), never the O(|purchases|
    x |clicks per user|) of a naive per-user theta join, and each qualifying
    pair appears exactly once (a click's two bucket copies are distinct).
    Timestamps compare as exact int64 microseconds (no FP, and it matches
    the µs-floored values Spark reads — the oracle casts its ns timestamps
    down identically).
    """
    ev = read_table(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    micros = epoch_micros_from_ntz(F.col("ts"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        micros.alias("p_us"),
        # exact int64 bucket: subtract the modulus before dividing so the
        # double division is of an exact multiple (floor(x/y) via FP can
        # round down an exact-boundary quotient)
        ((micros - micros % hour_us) / hour_us).cast("long").alias("bucket"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        micros.alias("c_us"),
        ((micros - micros % hour_us) / hour_us).cast("long").alias("cb"),
    )
    cx = c.withColumn(
        "bucket", F.explode(F.array(F.col("cb"), F.col("cb") + 1))
    ).drop("cb")
    return (
        p.join(cx, ["user_id", "bucket"])
        .filter(
            (F.col("c_us") < F.col("p_us"))
            & (F.col("c_us") >= F.col("p_us") - hour_us)
        )
        .groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_prior_hour"))
    )


def join_skew_aqe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-join demonstrator — enrich every event with its type's totals
    via a deliberately skewed shuffle join on ``event_type`` (5 distinct
    values → a handful of hot shuffle partitions, most empty: the
    partition-level skew profile a hot ``user_id`` join has at 100 TB).

    Plan shape (pinned in ``tests/test_plans.py``): both sides are BARE
    shuffle stages under the sort-merge join, which is exactly what AQE's
    ``OptimizeSkewedJoin`` needs to split a skewed partition by mapper
    boundary (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead skewed``).
    Two locally-load-bearing choices, both no-ops at production scale:

    - ``repartition`` on each input stands in for "many upstream map
      tasks" — a single-mapper shuffle (one small parquet file) has no
      mapper boundaries to split on, so AQE provably cannot help;
    - merge hints force the fact-fact SMJ shape (a 5-row dim would
      broadcast here; the 100 TB analogue — events x user-profiles — has
      no broadcastable side).

    The skew-size thresholds themselves stay at engine defaults (256 MB)
    in registered runs; the plan test lowers them to emulate at-scale
    partition sizes on fixture data. ``agg_salted_two_phase`` is the
    complementary manual-mitigation pattern."""
    ev = read_table(spark, sf_dir, "events")
    fact = ev.select("event_id", "event_type", "value").repartition(8)
    totals = (
        ev.groupBy("event_type")
        .agg(
            F.round(dsum("value"), 4).alias("type_total"),
            F.count(F.lit(1)).alias("n_type"),
        )
        .repartition(4)
    )
    return (
        fact.hint("merge")
        .join(totals.hint("merge"), "event_type")
        .select(
            "event_id",
            "event_type",
            "n_type",
            "type_total",
            dround(F.col("value") / F.col("type_total"), 6).alias(
                "value_share"
            ),
        )
    )


def join_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer reconciliation — the data-engineering staple the join
    family otherwise lacks: two overlapping extracts of orders (an early
    date slice vs a high-value slice) FULL OUTER joined on the key, each
    key classified both/a_only/b_only, counts and per-side sums per
    class. One shuffle on the key; the classification is a null-check
    projection."""
    o = read_table(spark, sf_dir, "orders")
    _ts = lambda s: F.lit(s).cast("timestamp_ntz")  # noqa: E731
    a = o.filter(F.col("o_orderdate") < _ts("1998-01-01")).select(
        F.col("o_orderkey").alias("ka"), F.col("o_totalprice").alias("amt_a")
    )
    b = o.filter(F.col("o_totalprice") > 200000.0).select(
        F.col("o_orderkey").alias("kb"), F.col("o_totalprice").alias("amt_b")
    )
    j = a.join(b, a.ka == b.kb, "full_outer")
    cls = (
        F.when(F.col("ka").isNotNull() & F.col("kb").isNotNull(), F.lit("both"))
        .when(F.col("ka").isNotNull(), F.lit("a_only"))
        .otherwise(F.lit("b_only"))
    )
    return (
        j.select(
            cls.alias("cls"),
            F.coalesce("amt_a", F.lit(0.0)).alias("va"),
            F.coalesce("amt_b", F.lit(0.0)).alias("vb"),
        )
        .groupBy("cls")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(dsum("va"), 4).alias("total_a"),
            F.round(dsum("vb"), 4).alias("total_b"),
        )
        .orderBy("cls")
    )


def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): NULL keys
    MATCH each other instead of vanishing — the semantics plain ``=``
    joins silently drop. Demonstrated on a nullable derived key (priority
    with '1-URGENT' nulled out on both sides): the NULL-NULL bucket pairs
    up under ``eqNullSafe`` and would be absent under ``=``. Output is the
    per-key-pair match count."""
    o = read_table(spark, sf_dir, "orders")
    a = o.groupBy(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("ka")
    ).agg(F.count(F.lit(1)).alias("na"))
    b = o.groupBy(
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("kb")
    ).agg(F.count(F.lit(1)).alias("nb"))
    return (
        a.join(b, F.col("ka").eqNullSafe(F.col("kb")))
        .select(
            F.coalesce("ka", F.lit("<null>")).alias("key"),
            "na",
            "nb",
            (F.col("na") * F.col("nb")).alias("pair_count"),
        )
        .orderBy("key")
    )


QUERIES = {
    "join_interval_bucketed": join_interval_bucketed,
    "join_broadcast_dim": join_broadcast_dim,
    "join_shuffle_3way": join_shuffle_3way,
    "join_semi_anti": join_semi_anti,
    "join_range_asof": join_range_asof,
    "join_skew_aqe": join_skew_aqe,
    "join_full_outer_reconcile": join_full_outer_reconcile,
    "join_null_safe_eq": join_null_safe_eq,
    "join_bitmap_prefiltered": join_bitmap_prefiltered,
    "join_asof_nearest": join_asof_nearest,
}

ORACLE = {
    "join_asof_nearest": (
        "WITH cand AS (SELECT p.event_id AS purchase_id, p.user_id, "
        "CAST(p.ts AS TIMESTAMP) AS purchase_ts, "
        "CAST(c.ts AS TIMESTAMP) AS cts, "
        "abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - "
        "epoch_us(CAST(c.ts AS TIMESTAMP))) AS gap_us, "
        "CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END AS dir "
        "FROM events p JOIN events c ON p.user_id = c.user_id "
        "WHERE p.event_type = 'purchase' AND c.event_type = 'click' "
        "AND abs(epoch_us(CAST(p.ts AS TIMESTAMP)) - "
        "epoch_us(CAST(c.ts AS TIMESTAMP))) <= "
        f"{ASOF_NEAREST_TOL_US}), "
        "r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY purchase_id "
        "ORDER BY gap_us, dir) AS rn FROM cand) "
        "SELECT purchase_id, user_id, purchase_ts, "
        "cts AS nearest_click_ts, "
        "CASE WHEN dir = 0 THEN 'backward' ELSE 'forward' END "
        "AS direction, gap_us FROM r WHERE rn = 1 ORDER BY purchase_id"
    ),
    "join_bitmap_prefiltered": (
        "SELECT CAST(year(o_orderdate) AS INT) AS year, "
        "COUNT(*) AS n_orders, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS total "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "GROUP BY 1 ORDER BY 1"
    ),
    "join_null_safe_eq": (
        "WITH a AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS ka, "
        "COUNT(*) AS na FROM orders GROUP BY 1), "
        "b AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS kb, "
        "COUNT(*) AS nb FROM orders GROUP BY 1) "
        "SELECT COALESCE(ka, '<null>') AS key, na, nb, na * nb AS pair_count "
        "FROM a JOIN b ON ka IS NOT DISTINCT FROM kb ORDER BY 1"
    ),
    "join_interval_bucketed": (
        "SELECT p.event_id AS purchase_id, p.user_id, "
        "COUNT(*) AS n_clicks_prior_hour "
        "FROM events p JOIN events c ON c.user_id = p.user_id "
        "WHERE p.event_type = 'purchase' AND c.event_type = 'click' "
        "AND epoch_us(CAST(c.ts AS TIMESTAMP)) < "
        "epoch_us(CAST(p.ts AS TIMESTAMP)) "
        "AND epoch_us(CAST(c.ts AS TIMESTAMP)) >= "
        "epoch_us(CAST(p.ts AS TIMESTAMP)) - 3600000000 "
        "GROUP BY 1, 2"
    ),
    "join_broadcast_dim": (
        "SELECT c_mktsegment, COUNT(*) AS n_orders, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS total "
        "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
    ),
    "join_shuffle_3way": (
        "SELECT n_name, COUNT(*) AS n_orders, "
        f"ROUND({dsum_sql('o_totalprice')}, 4) AS total "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey GROUP BY 1"
    ),
    "join_semi_anti": (
        "SELECT n_name, "
        "CAST(SUM(CASE WHEN EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_with_orders, "
        "CAST(SUM(CASE WHEN NOT EXISTS "
        "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1"
    ),
    "join_range_asof": (
        "SELECT e.event_id, e.user_id, MAX(o.o_orderdate) AS last_order_ts "
        "FROM events e LEFT JOIN orders o "
        "ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts "
        "GROUP BY 1, 2"
    ),
    "join_skew_aqe": (
        "WITH t AS (SELECT event_type, "
        f"ROUND({dsum_sql('value')}, 4) AS type_total, "
        "COUNT(*) AS n_type FROM events GROUP BY 1) "
        "SELECT event_id, e.event_type, n_type, type_total, "
        "ROUND(value / type_total, 6) AS value_share "
        "FROM events e JOIN t ON e.event_type = t.event_type"
    ),
    "join_full_outer_reconcile": (
        "WITH a AS (SELECT o_orderkey AS ka, o_totalprice AS amt_a "
        "FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'), "
        "b AS (SELECT o_orderkey AS kb, o_totalprice AS amt_b "
        "FROM orders WHERE o_totalprice > 200000.0) "
        "SELECT CASE WHEN ka IS NOT NULL AND kb IS NOT NULL THEN 'both' "
        "WHEN ka IS NOT NULL THEN 'a_only' ELSE 'b_only' END AS cls, "
        "COUNT(*) AS n_keys, "
        f"ROUND({dsum_sql('COALESCE(amt_a, 0.0)')}, 4) AS total_a, "
        f"ROUND({dsum_sql('COALESCE(amt_b, 0.0)')}, 4) AS total_b "
        "FROM a FULL OUTER JOIN b ON ka = kb GROUP BY 1 ORDER BY 1"
    ),
}


def sql_asof_dialect_duckdb_native(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """**Cross-dialect as-of equivalence**: Spark's union-timeline
    formulation of the backward as-of join (the `join_range_asof`
    device — one shuffle, `last_value(ignoreNulls)` carries the most
    recent prior order) hash-checked against DuckDB's NATIVE
    ``ASOF JOIN`` physical operator — the strongest statement that the
    window rewrite IS the as-of join, not an approximation of it
    (kdb ``aj`` / pandas ``merge_asof`` semantics: strictly the
    latest order at-or-before each event). Inner-flavored: events with
    no prior order drop on both sides.

    Scale: identical plan to `join_range_asof` (one exchange by user,
    linear in |events| + |orders|) plus the NOT NULL filter."""
    asof = join_range_asof(spark, sf_dir)
    return (
        asof.filter(F.col("last_order_ts").isNotNull())
        .select("event_id", "user_id", "last_order_ts")
        .orderBy("event_id")
    )


QUERIES["sql_asof_dialect_duckdb_native"] = sql_asof_dialect_duckdb_native

# DuckDB's native ASOF JOIN: for each left row, the single right row
# with the greatest o_orderdate <= e.ts per equality group. Ties on
# o_orderdate collapse to the same MAX timestamp either way, so the
# projected (event, last_order_ts) pair is deterministic.
ORACLE["sql_asof_dialect_duckdb_native"] = (
    "SELECT e.event_id, e.user_id, o.o_orderdate AS last_order_ts "
    "FROM events e ASOF JOIN orders o "
    "ON o.o_custkey = e.user_id AND e.ts >= o.o_orderdate "
    "ORDER BY e.event_id"
)
