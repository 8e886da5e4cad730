"""Sort / limit / top-k operators (SURVEY.md §2.6).

Top-k compiles to TakeOrderedAndProject: each partition keeps a k-sized
heap and only k rows per partition reach the driver — a global sort
never happens. That is the difference between shuffling 100 TB and
shuffling k rows, so any "first N by X" query must be written as
orderBy+limit, never sort-then-head.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_sort_multi",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority,
               nullif(o_orderstatus, 'O') AS status_or_null
        FROM orders
        WHERE o_totalprice > 250000
        ORDER BY o_orderpriority DESC, o_totalprice ASC,
                 status_or_null ASC NULLS FIRST
    """,
    description="Multi-key sort with explicit null placement (range-partitioned exchange)",
    tags=("sort",),
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort = range-partitioning exchange (sampled bounds) +
    per-partition sort. The driver's hash is order-insensitive, so the
    sort keys are projected to make the result self-describing."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000)
    return o.select(
        "o_orderkey",
        "o_totalprice",
        "o_orderpriority",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
    ).orderBy(
        F.col("o_orderpriority").desc(),
        F.col("o_totalprice").asc(),
        F.col("status_or_null").asc_nulls_first(),
    )


@query(
    "q_topk_global",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    description="Global top-k -> TakeOrderedAndProject (per-partition heaps, no full sort)",
    tags=("sort", "topk"),
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    # o_orderkey tiebreak makes the k-th boundary deterministic.
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@query(
    "q_limit",
    oracle=None,  # unordered LIMIT picks arbitrary rows -> rows-only check
    description="Limit without order (row-count contract only)",
    tags=("limit",),
)
def q_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber").limit(50)
