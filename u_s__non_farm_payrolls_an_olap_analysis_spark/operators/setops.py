"""Set operations (SURVEY §2.10 X8) — none exist in the reference
(single table, SURVEY §2.7); these add the relational set surface.

One query exercises all three ops over customer-key sets and tags each
result so the union of the three is one oracle-checkable frame:

- ``union``     : BUILDING-segment ∪ high-balance (distinct)
- ``intersect`` : BUILDING-segment ∩ high-balance
- ``except``    : BUILDING-segment ∖ high-balance (exceptAll on distinct
  inputs ≡ EXCEPT)

Physically each set op is a hash aggregate / hash semi-join on the key —
shuffle-partitioned, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import read_table


def setop_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = read_table(spark, sf_dir, "customer")
    building = customer.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey"
    )
    rich = customer.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    tagged = (
        building.union(rich)
        .distinct()
        .withColumn("op", F.lit("union"))
        .unionByName(building.intersect(rich).withColumn("op", F.lit("intersect")))
        .unionByName(
            building.distinct()
            .exceptAll(rich)
            .withColumn("op", F.lit("except"))
        )
    )
    return tagged.select("op", "c_custkey")


def setop_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X8b — multiset (bag) semantics: ``intersectAll`` / ``exceptAll``
    preserve duplicate multiplicities (a customer with 3 'F' orders and 1
    urgent order keeps 2 copies in the except). Distinct-based set ops
    collapse these; both semantics matter and Spark implements each."""
    orders = read_table(spark, sf_dir, "orders")
    finished = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        finished.intersectAll(urgent)
        .withColumn("op", F.lit("intersect_all"))
        .unionByName(
            finished.exceptAll(urgent).withColumn("op", F.lit("except_all"))
        )
        .select("op", "o_custkey")
    )


QUERIES = {
    "setop_union_except": setop_union_except,
    "setop_multiset": setop_multiset,
}

ORACLE = {
    "setop_union_except": (
        "WITH b AS (SELECT c_custkey FROM customer "
        "WHERE c_mktsegment = 'BUILDING'), "
        "r AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000) "
        "SELECT 'union' AS op, c_custkey FROM (SELECT * FROM b UNION SELECT * FROM r) "
        "UNION ALL "
        "SELECT 'intersect' AS op, c_custkey FROM (SELECT * FROM b INTERSECT SELECT * FROM r) "
        "UNION ALL "
        "SELECT 'except' AS op, c_custkey FROM (SELECT * FROM b EXCEPT SELECT * FROM r)"
    ),
    "setop_multiset": (
        "WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'), "
        "u AS (SELECT o_custkey FROM orders "
        "WHERE o_orderpriority = '1-URGENT') "
        "SELECT 'intersect_all' AS op, o_custkey FROM "
        "(SELECT * FROM f INTERSECT ALL SELECT * FROM u) "
        "UNION ALL "
        "SELECT 'except_all' AS op, o_custkey FROM "
        "(SELECT * FROM f EXCEPT ALL SELECT * FROM u)"
    ),
}
