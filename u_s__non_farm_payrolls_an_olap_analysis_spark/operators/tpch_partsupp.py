"""TPC-H Q2/Q9/Q20 shapes over a synthesized ``partsupp`` table.

The driver fixture has no ``partsupp`` (TESTDATA.md), which blocked the
last three TPC-H shapes (SURVEY §8): the min-cost-supplier correlated
subquery (Q2), the product-profit 6-table join (Q9), and the
excess-inventory nested semi-join chain (Q20). ``partsupp`` is therefore
DERIVED deterministically from ``part`` × ``supplier`` — dbgen's own
assignment formula (4 suppliers per part, 0-based keys):

    ps_suppkey(p, i) = (p + i * (S div 4 + p div S)) mod S,   i ∈ 0..3

with seeded integer-hash costs/quantities, so the derivation is pure
integer arithmetic reproducible bit-for-bit in any engine. The DuckDB
oracles build the SAME table via a CTE (``_PARTSUPP_CTE``) — the parity
gate then proves the three query shapes, not just the synthesis.

Scale posture: the derivation is a narrow map-side op on ``part`` (an
explode by 4; the supplier count is a 1-row broadcast scalar) — no
shuffle, no data-dependence, so at 100 TB it costs one pass over the
``part`` dimension. Reference parity: the reference app
(`dashboard_nfp.py`) has no multi-table queries at all; these extend the
engine's decision-support surface per SURVEY §2.10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numerics import dsum, dsum_sql
from ..io import read_table


def _partsupp_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``partsupp``: 4 suppliers per part (dbgen formula),
    seeded ``ps_supplycost`` ∈ [100, 1000) with 2 implied decimals and
    ``ps_availqty`` ∈ [1, 9999], all exact int64 arithmetic — kept
    expression-only so Catalyst folds the scalar and codegens the math
    (`div` = integer division, exact twin of DuckDB's ``//`` on BIGINT
    for the non-negative key domain)."""
    part = read_table(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("ps_partkey")
    )
    s_cnt = read_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).cast("long").alias("s_cnt")
    )
    exploded = part.crossJoin(F.broadcast(s_cnt)).select(
        "ps_partkey",
        "s_cnt",
        F.explode(F.array(*[F.lit(k).cast("long") for k in range(4)])).alias(
            "i"
        ),
    )
    with_key = exploded.select(
        "ps_partkey",
        F.expr(
            "(ps_partkey + i * ((s_cnt div 4) + (ps_partkey div s_cnt)))"
            " % s_cnt"
        ).alias("ps_suppkey"),
    )
    return with_key.select(
        "ps_partkey",
        "ps_suppkey",
        (
            ((F.col("ps_partkey") * 7 + F.col("ps_suppkey") * 13) % 90000)
            .cast("double")
            / 100.0
            + 100.0
        ).alias("ps_supplycost"),
        (
            (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 9999 + 1
        ).alias("ps_availqty"),
    )


# DuckDB twin of _partsupp_df — identical integer arithmetic, same column
# names/types. COUNT(*) is BIGINT in DuckDB, so // and % stay integral.
_PARTSUPP_CTE = (
    "ps0 AS ("
    "SELECT p_partkey AS ps_partkey, "
    "(p_partkey + i.i * ((s.s // 4) + (p_partkey // s.s))) % s.s "
    "AS ps_suppkey "
    "FROM part, (SELECT COUNT(*) AS s FROM supplier) s, "
    "(VALUES (0), (1), (2), (3)) i(i)), "
    "partsupp AS ("
    "SELECT ps_partkey, ps_suppkey, "
    "CAST((ps_partkey * 7 + ps_suppkey * 13) % 90000 AS DOUBLE) / 100.0 "
    "+ 100.0 AS ps_supplycost, "
    "(ps_partkey * 31 + ps_suppkey * 17) % 9999 + 1 AS ps_availqty "
    "FROM ps0)"
)


def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape — for one part size/type and one region, the supplier(s)
    offering each part at that region's MINIMUM supply cost.

    The spec's correlated scalar subquery (``ps_supplycost = (SELECT
    MIN(...) WHERE p_partkey = ps_partkey ...)``) is decorrelated into a
    per-part MIN WINDOW over the eligible (part, supplier, cost) set:
    one shuffle by partkey, filter rows at the partition minimum. Round 7
    replaced the earlier aggregate-then-broadcast-join-back form — that
    shape executed the whole eligible pipeline TWICE (the broadcast side
    re-runs its subtree) and broadcasting a per-KEY aggregate grows with
    the key count, which does not survive 100 TB; the window form is one
    pass and needs no broadcast. Dims broadcast; part filter prunes
    before the shuffle."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter((F.col("p_size") < 25) & F.col("p_type").like("%NOMY"))
        .select("p_partkey", "p_brand")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    # the derivation itself reads part/supplier, so the outer dim joins
    # must be alias-qualified or Spark flags an ambiguous self-join
    ps = _partsupp_df(spark, sf_dir).alias("ps")
    eligible = (
        ps.join(
            F.broadcast(part.alias("p")),
            F.col("ps.ps_partkey") == F.col("p.p_partkey"),
        )
        .join(
            F.broadcast(supp.alias("s")),
            F.col("ps.ps_suppkey") == F.col("s.s_suppkey"),
        )
        .join(
            F.broadcast(nation.alias("n")),
            F.col("s.s_nationkey") == F.col("n.n_nationkey"),
        )
        .join(
            F.broadcast(region.alias("r")),
            F.col("n.n_regionkey") == F.col("r.r_regionkey"),
        )
        .select(
            "ps_partkey", "ps_supplycost", "p_brand",
            "s_acctbal", "s_name", "n_name",
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("ps_partkey")
    return (
        eligible.withColumn("mc_cost", F.min("ps_supplycost").over(w))
        .filter(F.col("ps_supplycost") == F.col("mc_cost"))
        .select(
            F.round("s_acctbal", 4).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            "p_brand",
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        # (s_name, p_partkey) is a unique key -> total order, stable LIMIT
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape — profit (revenue minus supply cost) by supplier nation
    and order year for one part family.

    lineitem joins partsupp on BOTH keys (part, supplier) — the composite
    equi-join dbgen's schema exists to exercise; the part filter is
    applied to partsupp first so the big probe side only meets the ~1/8
    of pairs that survive. orders⋈lineitem is the one big shuffle;
    supplier/nation broadcast. Money is the deterministic scaled-int
    sum."""
    part = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    ps = (
        _partsupp_df(spark, sf_dir)
        .alias("ps")
        .join(
            F.broadcast(part.alias("p")),
            F.col("ps.ps_partkey") == F.col("p.p_partkey"),
        )
        .select("ps_partkey", "ps_suppkey", "ps_supplycost")
    )
    li = read_table(spark, sf_dir, "lineitem").alias("li")
    orders = read_table(spark, sf_dir, "orders")
    supp = read_table(spark, sf_dir, "supplier").alias("s")
    nation = read_table(spark, sf_dir, "nation").alias("n")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "ps_supplycost"
    ) * F.col("l_quantity")
    return (
        li.join(
            ps,
            (F.col("li.l_partkey") == F.col("ps_partkey"))
            & (F.col("li.l_suppkey") == F.col("ps_suppkey")),
        )
        .join(orders, F.col("li.l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            F.col("li.l_suppkey") == F.col("s.s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s.s_nationkey") == F.col("n.n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(dsum(amount), 4).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def tpch_q20_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape — suppliers in one region holding more than half a
    year's shipped quantity of a part family: the nested semi-join chain
    (part ⊂ partsupp ⊂ supplier) with a correlated quantity threshold.

    Decorrelated: aggregate 1997 shipments per (part, supplier) once,
    equi-join to partsupp, threshold-filter, then LEFT SEMI join supplier
    — no per-row subquery, no distinct-then-join (the semi join
    deduplicates for free). All dims broadcast."""
    red_parts = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    ps = _partsupp_df(spark, sf_dir).join(
        F.broadcast(red_parts), F.col("ps_partkey") == F.col("p_partkey")
    )
    shipped = (
        read_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("qty_1997"))
    )
    excess = (
        ps.join(
            shipped,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("qty_1997"))
        .select("ps_suppkey")
    )
    supp = read_table(spark, sf_dir, "supplier")
    nation = read_table(spark, sf_dir, "nation")
    region = read_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        supp.join(excess, supp.s_suppkey == excess.ps_suppkey, "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


QUERIES = {
    "tpch_q2_min_cost_supplier": tpch_q2_min_cost_supplier,
    "tpch_q9_product_profit": tpch_q9_product_profit,
    "tpch_q20_excess_inventory": tpch_q20_excess_inventory,
}

ORACLE = {
    "tpch_q2_min_cost_supplier": (
        f"WITH {_PARTSUPP_CTE}, "
        "eligible AS ("
        "SELECT ps.ps_partkey, ps.ps_supplycost, p.p_brand, "
        "s.s_acctbal, s.s_name, n.n_name "
        "FROM partsupp ps "
        "JOIN part p ON ps.ps_partkey = p.p_partkey "
        "JOIN supplier s ON ps.ps_suppkey = s.s_suppkey "
        "JOIN nation n ON s.s_nationkey = n.n_nationkey "
        "JOIN region r ON n.n_regionkey = r.r_regionkey "
        "WHERE r.r_name = 'EUROPE' AND p.p_size < 25 "
        "AND p.p_type LIKE '%NOMY'), "
        "mc AS (SELECT ps_partkey AS mc_partkey, "
        "MIN(ps_supplycost) AS mc_cost FROM eligible GROUP BY 1) "
        "SELECT ROUND(s_acctbal, 4) AS s_acctbal, s_name, n_name, "
        "ps_partkey AS p_partkey, p_brand, "
        "ROUND(ps_supplycost, 4) AS supplycost "
        "FROM eligible e JOIN mc ON e.ps_partkey = mc.mc_partkey "
        "AND e.ps_supplycost = mc.mc_cost "
        "ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"
    ),
    "tpch_q9_product_profit": (
        f"WITH {_PARTSUPP_CTE} "
        "SELECT n_name AS nation, "
        "CAST(year(o_orderdate) AS INT) AS o_year, "
        "ROUND("
        + dsum_sql(
            "l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity"
        )
        + ", 4) AS sum_profit "
        "FROM lineitem "
        "JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE p_name LIKE '%red%' "
        "GROUP BY 1, 2 ORDER BY nation, o_year DESC"
    ),
    "tpch_q20_excess_inventory": (
        f"WITH {_PARTSUPP_CTE}, "
        "shipped AS (SELECT l_partkey, l_suppkey, "
        + dsum_sql("l_quantity")
        + " AS qty_1997 FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1, 2), "
        "excess AS ("
        "SELECT DISTINCT ps_suppkey FROM partsupp ps "
        "JOIN part p ON ps.ps_partkey = p.p_partkey "
        "JOIN shipped sh ON ps.ps_partkey = sh.l_partkey "
        "AND ps.ps_suppkey = sh.l_suppkey "
        "WHERE p.p_name LIKE 'red%' "
        "AND ps.ps_availqty > 0.5 * sh.qty_1997) "
        "SELECT s_name, n_name FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' "
        "AND s_suppkey IN (SELECT ps_suppkey FROM excess) "
        "ORDER BY s_name"
    ),
}
