"""Bucketed joins + CBO statistics (SURVEY.md §4): the shuffle-free
co-located join story.

At 100 TB the single most expensive part of a fact-fact join is
shuffling both sides on the key. Writing the tables bucketed on that
key (``bucketBy(n, key)``) pins co-partitioning into the STORAGE
layout: every later join on the key reads matching buckets pairwise
and the exchange disappears from the plan entirely (test_plans gates
this). ANALYZE TABLE afterwards feeds the cost-based optimizer real
row counts so join ordering/strategy decisions use statistics instead
of guesses.

The bucketed copies are written once per session into scratch space;
a real deployment would maintain them as the canonical fact tables.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..session import scratch_dir
from ..tables import load

N_BUCKETS = 8


def _token(sf_dir: str) -> str:
    return re.sub(r"\W+", "_", sf_dir).strip("_")


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Ensure bucketed lineitem/orders copies exist for ``sf_dir``;
    returns (lineitem_table, orders_table) catalog names.

    Both sides bucket on the join key with the same bucket count —
    the precondition for a pairwise-bucket (exchange-free) join. The
    write itself shuffles once; every subsequent join amortizes it.
    """
    tok = _token(sf_dir)
    lt, ot = f"lineitem_bkt_{tok}", f"orders_bkt_{tok}"
    if not spark.catalog.tableExists(lt):
        (
            load(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_extendedprice", "l_quantity")
            .write.bucketBy(N_BUCKETS, "l_orderkey")
            .sortBy("l_orderkey")
            .option("path", scratch_dir("bkt_lineitem_"))
            .mode("overwrite")
            .saveAsTable(lt)
        )
        spark.sql(f"ANALYZE TABLE {lt} COMPUTE STATISTICS")
    if not spark.catalog.tableExists(ot):
        (
            load(spark, sf_dir, "orders")
            .select("o_orderkey", "o_orderpriority")
            .write.bucketBy(N_BUCKETS, "o_orderkey")
            .sortBy("o_orderkey")
            .option("path", scratch_dir("bkt_orders_"))
            .mode("overwrite")
            .saveAsTable(ot)
        )
        spark.sql(f"ANALYZE TABLE {ot} COMPUTE STATISTICS")
    return lt, ot


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw bucketed fact-fact join (no aggregation) — the object
    the plan gate inspects for exchange-freedom. merge hints keep the
    demonstration an SMJ even where a side would fit broadcast."""
    lt, ot = bucketed_tables(spark, sf_dir)
    return (
        spark.table(lt)
        .hint("merge")
        .join(
            spark.table(ot).hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )


@query(
    "q_join_bucketed",
    oracle="""
        SELECT o_orderpriority,
               count(*)                                     AS n_lines,
               round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS revenue,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
    description="Shuffle-free bucketed fact-fact join (bucketBy on the join key) + CBO table statistics",
    tags=("join", "bucketing", "cbo"),
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join through the bucketed layout, then aggregate. The join stage
    reads co-located buckets pairwise (no Exchange feeding the SMJ —
    gated in test_plans); only the final small aggregation shuffles."""
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("total_qty"),
        )
    )
