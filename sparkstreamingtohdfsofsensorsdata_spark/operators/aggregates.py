"""Aggregation operators (SURVEY.md §2.4).

All aggregations are expressed declaratively so Spark plans them as
partial (map-side) + final hash aggregates automatically — at 100 TB the
partial agg is what keeps the shuffle small (bytes shuffled scale with
group cardinality, not input rows).

Floating-point note: double sums are not associative, and Spark and the
DuckDB oracle reduce in different orders. Every money/measure aggregate
is therefore rounded (2dp for sums, 6dp for ratios) in BOTH the Spark
query and the oracle SQL, which makes the value-hash comparison stable
without weakening it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_agg_group",
    oracle="""
        SELECT
            l_returnflag,
            l_linestatus,
            round(sum(l_quantity), 2)                                        AS sum_qty,
            round(sum(l_extendedprice), 2)                                   AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
            round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
            round(avg(l_quantity), 6)                                        AS avg_qty,
            round(avg(l_extendedprice), 6)                                   AS avg_price,
            round(avg(l_discount), 6)                                        AS avg_disc,
            count(*)                                                         AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    description="Flagship TPC-H Q1 pricing summary: filter -> hash agg -> 8 aggregates",
    tags=("agg", "flagship"),
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan, sargable filter (pushed to parquet), grouped
    aggregation with map-side combine. The workhorse OLAP pattern."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
