"""Window-function operators (SURVEY.md §2.5).

A window spec is one shuffle on the partition key + one sort within the
partition; every function over the same spec reuses that single
exchange. Deterministic total order inside each partition (unique
tiebreak column) is mandatory — rank over a tied order is
engine-dependent.

At 100 TB the partition key choice is the scalability story: windows
over high-cardinality keys (user_id, suppkey) parallelize perfectly;
a window with no partitionBy collapses to one task and is forbidden
here except for provably tiny inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_win_ranking",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               row_number()   OVER w AS rn,
               rank()         OVER w AS rnk,
               dense_rank()   OVER w AS drnk,
               ntile(4)       OVER w AS quartile,
               CAST(floor(percent_rank() OVER w * 1000000 + 0.5) AS BIGINT) AS prank_micros,
               CAST(floor(cume_dist()    OVER w * 1000000 + 0.5) AS BIGINT) AS cdist_micros
        FROM orders
        WHERE o_totalprice > 350000
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    description="Ranking family: row_number/rank/dense_rank/ntile/percent_rank/cume_dist",
    tags=("window",),
)
def q_win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        # floor(x * 1e6 + 0.5) instead of round(x, 6): both engines
        # compute the IDENTICAL IEEE double for k/(n-1), but Spark's
        # round goes through the shortest DECIMAL repr (HALF_UP) while
        # DuckDB rounds the raw binary — at a 7-digit boundary (any
        # partition where n-1 has a factor of 5^k, e.g. 641 rows ->
        # steps of 1/640 = 0.0015625) they disagree in the 6th digit.
        # Scaled floor is pure double math, bit-identical on both.
        F.floor(F.percent_rank().over(w) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("prank_micros"),
        F.floor(F.cume_dist().over(w) * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("cdist_micros"),
    )


@query(
    "q_win_lag_lead",
    oracle="""
        SELECT event_id, user_id,
               round(value, 6)                                       AS value,
               round(lag(value, 1)  OVER w, 6)                       AS prev_value,
               round(lead(value, 1) OVER w, 6)                       AS next_value,
               round(value - lag(value, 1) OVER w, 6)                AS delta,
               lag(event_type, 1, 'none') OVER w                     AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    description="lag/lead analytics: per-sensor delta detection (the reference's alerting idiom)",
    tags=("window", "lag"),
)
def q_win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value"), 6).alias("value"),
        F.round(F.lag("value", 1).over(w), 6).alias("prev_value"),
        F.round(F.lead("value", 1).over(w), 6).alias("next_value"),
        F.round(F.col("value") - F.lag("value", 1).over(w), 6).alias("delta"),
        F.lag("event_type", 1, "none").over(w).alias("prev_type"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER w, 6)        AS running_qty,
               round(sum(l_extendedprice) OVER w, 6)   AS running_price,
               count(*) OVER w                         AS running_n
        FROM lineitem
        WHERE l_suppkey <= 20
        WINDOW w AS (PARTITION BY l_suppkey
                     ORDER BY l_shipdate, l_orderkey, l_linenumber
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description="Running aggregates over a ROWS frame (cumulative per supplier)",
    tags=("window", "frame"),
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 20)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w), 6).alias("running_qty"),
        F.round(F.sum("l_extendedprice").over(w), 6).alias("running_price"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@query(
    "q_win_frame_range",
    oracle="""
        SELECT event_id, user_id,
               CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
               count(*) OVER w AS n_last_hour,
               round(sum(value) OVER w, 6) AS sum_last_hour
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    description="Value-based RANGE frame: trailing 1-hour aggregate per user",
    tags=("window", "frame"),
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames include all peers of the current value, so the
    result is deterministic without a tiebreak; the frame is defined in
    epoch seconds (Spark rangeBetween needs a numeric order key)."""
    ev = load(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_sec").rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        "ts_sec",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 6).alias("sum_last_hour"),
    )


@query(
    "q_win_topk_group",
    oracle="""
        SELECT * FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) t WHERE rn <= 3
    """,
    description="Top-k per group: rank-filter, the distributed 'greatest-n-per-group'",
    tags=("window", "topk"),
)
def q_win_topk_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the group key; the rank filter cuts each partition
    to k rows before anything else happens downstream — the scalable
    form of per-entity top-k (vs a self-join, which is quadratic)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q_win_value_family",
    oracle="""
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               first_value(o_orderkey)  OVER w AS top_key,
               first_value(o_totalprice) OVER w AS top_price,
               last_value(o_orderkey)   OVER w AS bottom_key,
               nth_value(o_orderkey, 2) OVER w AS runnerup_key,
               round(o_totalprice
                     / first_value(o_totalprice) OVER w, 6) AS frac_of_top
        FROM orders
        WHERE o_totalprice > 400000
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
    description="Value family: first_value/last_value/nth_value over a full frame",
    tags=("window", "value"),
)
def q_win_value_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value need an explicit UNBOUNDED..UNBOUNDED frame:
    the default frame stops at CURRENT ROW, which silently turns
    last_value into "current value" — a classic window footgun on every
    engine. Deterministic because the order key is unique (tiebreak on
    o_orderkey)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("top_key"),
        F.first("o_totalprice").over(w).alias("top_price"),
        F.last("o_orderkey").over(w).alias("bottom_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("runnerup_key"),
        F.round(
            F.col("o_totalprice") / F.first("o_totalprice").over(w), 6
        ).alias("frac_of_top"),
    )


@query(
    "q_win_running_distinct",
    oracle="""
        WITH flagged AS (
            SELECT user_id, event_id,
                   CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY event_id
                   ) = 1 THEN 1 ELSE 0 END AS first_seen
            FROM events
        )
        SELECT user_id, event_id,
               CAST(sum(first_seen) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS distinct_types_so_far
        FROM flagged
    """,
    description="Running COUNT(DISTINCT) over a window via first-occurrence flags",
    tags=("window", "distinct"),
)
def q_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neither Spark nor ANSI allows COUNT(DISTINCT) OVER a running
    frame; the scalable rewrite marks each row that is the FIRST
    occurrence of its (partition, value) pair (row_number == 1 over the
    finer key) and running-sums the 0/1 flag over the coarser key. Two
    window passes, and since (user_id, event_type) hash-partitions are
    a refinement of user_id partitions the second pass is sort-only
    under AQE-preserved partitioning — versus the naive
    collect_set-over-window, whose per-row set state is O(n^2) memory
    at 100 TB. Ordering is by event_id (unique), never raw ts (ns/us
    divergence, SURVEY §1.3)."""
    ev = load(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        F.sum("first_seen").over(w_run).cast("long").alias("distinct_types_so_far"),
    )
