"""Projection / filter / predicate operators (SURVEY.md §2.2).

All predicates here are sargable on purpose: Catalyst pushes them into
the parquet reader (``PushedFilters`` in the plan), which is the single
biggest lever at 100 TB — a selective pushed filter skips whole
row groups via min/max statistics before any bytes are decoded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_project",
    oracle="""
        SELECT l_orderkey,
               l_linenumber,
               round(l_extendedprice * (1 - l_discount), 6) AS net_price,
               round(l_quantity * l_extendedprice, 6)       AS gross_value
        FROM lineitem
    """,
    description="Column projection with computed/aliased expressions",
    tags=("project",),
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
        F.round(F.col("l_quantity") * F.col("l_extendedprice"), 6).alias("gross_value"),
    )


@query(
    "q_filter_compare",
    oracle="""
        SELECT l_orderkey, l_partkey, l_quantity, l_discount
        FROM lineitem
        WHERE l_quantity > 30
          AND l_discount >= 0.05
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    """,
    description="Conjunctive comparison predicates (pushed to parquet)",
    tags=("filter",),
)
def q_filter_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_partkey", "l_quantity", "l_discount")


@query(
    "q_filter_in_between_like",
    oracle="""
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND o_totalprice BETWEEN 50000 AND 150000
          AND o_orderpriority LIKE '%URGENT%'
          AND NOT (o_orderkey % 10 = 3)
    """,
    description="IN / BETWEEN / LIKE / NOT predicate mix",
    tags=("filter",),
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 150000)
        & F.col("o_orderpriority").like("%URGENT%")
        & ~(F.col("o_orderkey") % 10 == 3)
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q_filter_null",
    oracle="""
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
               CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NULL
                    THEN 'is_building' ELSE 'other' END AS null_class
        FROM customer
        WHERE nullif(c_mktsegment, 'BUILDING') IS NULL
           OR (nullif(c_mktsegment, 'BUILDING') IS NOT NULL AND c_acctbal > 0)
    """,
    description="Null semantics / three-valued logic (nulls derived via nullif; fixtures have none)",
    tags=("filter", "null"),
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    out = c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.when(seg_or_null.isNull(), F.lit("is_building"))
        .otherwise(F.lit("other"))
        .alias("null_class"),
        "c_acctbal",
    )
    return out.filter(
        F.col("seg_or_null").isNull()
        | (F.col("seg_or_null").isNotNull() & (F.col("c_acctbal") > 0))
    ).drop("c_acctbal")


@query(
    "q_distinct",
    oracle="""
        SELECT DISTINCT l_returnflag, l_linestatus, l_shipdate
        FROM lineitem
        WHERE l_quantity > 45
    """,
    description="Duplicate elimination (hash-distinct = groupBy keys, partial agg first)",
    tags=("distinct",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity") > 45)
        .select("l_returnflag", "l_linestatus", "l_shipdate")
        .distinct()
    )
