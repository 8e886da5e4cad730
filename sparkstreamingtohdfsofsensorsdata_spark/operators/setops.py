"""Set operators (SURVEY.md §2.7).

UNION ALL is a zero-shuffle concatenation of children; the distinct
variants add one hash-repartition on the full row. INTERSECT/EXCEPT ALL
preserve multiplicities (bag semantics) — Spark plans them as joins on
all columns, identical to DuckDB's semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


def _building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("key"))
    )


def _big_spender_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select(F.col("o_custkey").alias("key"))
    )


@query(
    "q_set_union",
    oracle="""
        SELECT key, count(*) AS multiplicity
        FROM (
            SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
            UNION ALL
            SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        ) u
        GROUP BY key
    """,
    description="UNION ALL (bag union, no shuffle) + multiplicity count",
    tags=("setop",),
)
def q_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _big_spender_custkeys(spark, sf_dir)
    return a.unionByName(b).groupBy("key").agg(F.count(F.lit(1)).alias("multiplicity"))


@query(
    "q_set_union_distinct",
    oracle="""
        SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
    """,
    description="UNION (set semantics): concat + hash-distinct",
    tags=("setop",),
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _big_spender_custkeys(spark, sf_dir)
    return a.unionByName(b).distinct()


@query(
    "q_set_intersect",
    oracle="""
        SELECT key FROM (
            SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        ) INTERSECT ALL
        SELECT key FROM (
            SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        )
    """,
    description="INTERSECT ALL (bag intersection, min multiplicity)",
    tags=("setop",),
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _big_spender_custkeys(spark, sf_dir)
    return a.intersectAll(b)


@query(
    "q_set_except",
    oracle="""
        SELECT key FROM (
            SELECT o_custkey AS key FROM orders WHERE o_totalprice > 200000
        ) EXCEPT ALL
        SELECT key FROM (
            SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
        )
    """,
    description="EXCEPT ALL (bag difference, multiplicity-preserving)",
    tags=("setop",),
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _building_custkeys(spark, sf_dir)
    b = _big_spender_custkeys(spark, sf_dir)
    return b.exceptAll(a)


SYMDIFF_Y1, SYMDIFF_Y2 = 1996, 1997


@query(
    "q_set_symdiff",
    oracle=f"""
        WITH y1 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE date_part('year', o_orderdate) = {SYMDIFF_Y1}
        ),
        y2 AS (
            SELECT DISTINCT o_custkey FROM orders
            WHERE date_part('year', o_orderdate) = {SYMDIFF_Y2}
        )
        SELECT o_custkey AS c_custkey, 'only_{SYMDIFF_Y1}' AS side
        FROM (SELECT o_custkey FROM y1 EXCEPT SELECT o_custkey FROM y2)
        UNION ALL
        SELECT o_custkey, 'only_{SYMDIFF_Y2}'
        FROM (SELECT o_custkey FROM y2 EXCEPT SELECT o_custkey FROM y1)
    """,
    description=f"Symmetric difference: customers active in exactly one of {SYMDIFF_Y1}/{SYMDIFF_Y2}, tagged by side",
    tags=("setop", "anti"),
)
def q_set_symdiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference — the churn/acquisition split in one set
    op: customers who ordered in exactly one of two years, tagged with
    WHICH side (lost vs gained), completing the union/intersect/except
    family. Composed as two left-anti joins over the deduplicated
    year slices (EXCEPT's physical form), unioned with the lineage
    tag.

    Scale shape: each year slice is a pushed-down scan filter +
    distinct; the anti joins shuffle on the key both EXCEPTs already
    needed. At 100 TB both sides bucket by custkey and the whole thing
    is co-partitioned; no window, no Python."""
    orders = load(spark, sf_dir, "orders")
    y1 = (
        orders.filter(F.year("o_orderdate") == SYMDIFF_Y1)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    y2 = (
        orders.filter(F.year("o_orderdate") == SYMDIFF_Y2)
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
    )
    only1 = y1.join(y2, "c_custkey", "left_anti").select(
        "c_custkey", F.lit(f"only_{SYMDIFF_Y1}").alias("side")
    )
    only2 = y2.join(y1, "c_custkey", "left_anti").select(
        "c_custkey", F.lit(f"only_{SYMDIFF_Y2}").alias("side")
    )
    return only1.unionByName(only2)
