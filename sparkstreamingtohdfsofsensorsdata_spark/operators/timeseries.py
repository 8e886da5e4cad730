"""Time-series resampling operators (SURVEY.md §2.12 extensions):
regularize an irregular event stream onto a fixed grid (gap-fill), then
window over the regular series; OHLC-style per-bucket first/last
aggregation via min_by/max_by.

Scale shape: the only shuffle over the big table is the per-(key,
bucket) aggregation — map-side partial agg applies because count/sum/
min_by are all algebraic. The time grid is built from a 1-row bounds
aggregate (`sequence` + `explode`), never a driver-side action, and is
crossJoined broadcast-side against the distinct key set, so grid
construction costs O(buckets x keys) rows regardless of input size.
The trailing moving average rides one window spec (= one exchange on
event_type), which at 100 TB parallelizes by key cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_ts_gapfill",
    oracle="""
        WITH ev AS (
            SELECT date_trunc('hour', ts) AS hour, event_type, value
            FROM events
        ),
        hourly AS (
            SELECT event_type, hour, count(*) AS n, sum(value) AS v
            FROM ev GROUP BY event_type, hour
        ),
        bounds AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM ev),
        hours AS (
            SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
            FROM bounds
        ),
        grid AS (
            SELECT t.event_type, h.hour
            FROM hours h CROSS JOIN (SELECT DISTINCT event_type FROM ev) t
        ),
        filled AS (
            SELECT g.event_type, g.hour,
                   CAST(coalesce(n, 0) AS BIGINT) AS n_events,
                   round(coalesce(v, 0), 2)       AS sum_value,
                   CASE WHEN n IS NULL THEN 1 ELSE 0 END AS gap
            FROM grid g LEFT JOIN hourly USING (event_type, hour)
        )
        SELECT event_type, hour, n_events, sum_value, gap,
               round(avg(n_events) OVER (
                   PARTITION BY event_type ORDER BY hour
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS ma3_events
        FROM filled
    """,
    description="Resample events to an hourly grid, fill gaps with zeros, 3h trailing moving average",
    tags=("timeseries", "window", "join"),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill/resample: irregular events -> dense hourly series per
    event_type, missing buckets filled with zeros, then a trailing
    3-hour moving average over the regularized series.

    The grid bounds come from a 1-row min/max aggregate feeding
    ``sequence(h0, h1, interval 1 hour)`` — the plan stays lazy (no
    driver-side collect of the bounds) and the grid side is tiny, so
    Spark broadcasts it into the left join against the hourly
    aggregate.
    """
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type", "value"
    )
    hourly = ev.groupBy("event_type", "hour").agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    hours = (
        ev.agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias(
                "hour"
            )
        )
    )
    grid = hours.crossJoin(ev.select("event_type").distinct())
    filled = grid.join(F.broadcast(hourly), ["event_type", "hour"], "left").select(
        "event_type",
        "hour",
        F.coalesce("n", F.lit(0)).alias("n_events"),
        F.round(F.coalesce("v", F.lit(0.0)), 2).alias("sum_value"),
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("gap"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(-2, Window.currentRow)
    )
    return filled.withColumn("ma3_events", F.round(F.avg("n_events").over(w), 6))


@query(
    "q_ts_ohlc",
    oracle="""
        SELECT event_type,
               date_trunc('hour', ts)                   AS hour,
               round(arg_min(value, event_id), 2)       AS open,
               round(max(value), 2)                     AS high,
               round(min(value), 2)                     AS low,
               round(arg_max(value, event_id), 2)       AS close,
               CAST(count(*) AS BIGINT)                 AS n_events
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    """,
    description="OHLC-style bucket aggregation: first/last value per hour via min_by/max_by",
    tags=("timeseries", "aggregate"),
)
def q_ts_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket first/last aggregation (the financial OHLC shape):
    open/close are ``min_by``/``max_by`` over the ordering column —
    single-pass algebraic aggregates, so partial aggregation happens
    map-side and the shuffle carries one row per (event_type, hour).

    Ordering is by ``event_id`` (unique bigint), not raw ``ts``:
    within-bucket timestamp ties would make first/last engine-
    dependent, while the unique key keeps the result total-order
    deterministic on any engine.
    """
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(
        F.round(F.min_by("value", "event_id"), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", "event_id"), 2).alias("close"),
        F.count("*").alias("n_events"),
    )
