"""Streaming operators (SURVEY.md §2.9) — the reference's core surface,
rebuilt on Structured Streaming.

Each function takes an (already-streaming) events DataFrame and returns
the transformed streaming DataFrame; binding to a source and a sink
happens in the runner. This keeps every operator testable by
batch-equivalence replay: the same function applied to the batch view
must produce the same result (prefix-consistency of Structured
Streaming makes that a sound oracle).

Scale notes:
- Watermarks bound state: without one, windowed state grows forever.
  Every operator takes the delay as a parameter (the late-data tests
  pass tight ones); the RETAIN_ALL_WATERMARK default outlives the
  fixture's span so a full replay retains everything and equals batch.
- Windowed aggregation state lives in the per-partition state store,
  keyed by (window, group key) — sizing is group-cardinality x windows
  in flight, independent of input volume.
- Stream-stream joins keep both sides' state until the watermark passes
  the join condition's time bound; the tighter the bound, the smaller
  the state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Longer than the fixture's 30-day span: nothing is ever late in tests,
# so a replayed stream equals the batch computation exactly.
RETAIN_ALL_WATERMARK = "60 days"


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = RETAIN_ALL_WATERMARK,
) -> DataFrame:
    """Per-event-type counts + value sums in fixed event-time buckets."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = RETAIN_ALL_WATERMARK,
) -> DataFrame:
    """Overlapping windows: each event lands in window/slide buckets.

    The mean accumulates exact integer cents and divides back (the
    q_agg_group determinism contract): a float avg()'s low bits ride
    both accumulation order AND the engines' different avg algorithms,
    while sum-of-ints / 100.0 / n is bit-identical everywhere —
    including across micro-batch boundaries on a real stream."""
    value_c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(value_c).cast("double") / 100.0 / F.count(F.lit(1))).alias(
                "value_avg"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "value_avg",
        )
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = RETAIN_ALL_WATERMARK,
) -> DataFrame:
    """Gap-based sessionization per user: a session closes after ``gap``
    of inactivity. State per (user, open session) only."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


def dedup_keys(
    events: DataFrame,
    keys: tuple[str, ...] = ("user_id", "event_type"),
    watermark: str | None = None,
) -> DataFrame:
    """Streaming dedup: first-seen row per key survives. Projecting the
    keys makes the result order-independent (= batch DISTINCT).

    With a watermark, use dropDuplicatesWithinWatermark in production so
    key state is evicted once the key can no longer recur — unbounded
    dedup state is the classic streaming leak."""
    if watermark is not None:
        return (
            events.withWatermark("ts", watermark)
            .dropDuplicatesWithinWatermark(list(keys))
            .select(*keys)
        )
    return events.dropDuplicates(list(keys)).select(*keys)


def enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static join: per-micro-batch broadcast hash join against a
    dimension table — the dimension is re-resolved every batch, so a
    refreshed parquet dim is picked up without restarting the query."""
    return (
        events.join(F.broadcast(dim), events.user_id == dim.c_custkey, "inner")
        .select("event_id", "user_id", "event_type", "c_name", "c_mktsegment")
    )


def purchases_joined_views(
    events: DataFrame,
    within: str = "INTERVAL 10 MINUTES",
    watermark: str = RETAIN_ALL_WATERMARK,
) -> DataFrame:
    """Stream-stream inner join: each purchase matched to the same
    user's views in the preceding ``within``. Both sides watermarked;
    the time-bound condition lets the engine evict view state once the
    watermark passes ts + within."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr(within))
    )
    return purchases.join(views, cond, "inner").select("p_id", "v_id", "p_user")


def purchases_left_joined_views(
    events: DataFrame,
    within: str = "INTERVAL 10 MINUTES",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase, matched to the
    same user's views in the preceding ``within`` — or a NULL view if
    none arrived. Unlike the inner variant, the null row for an
    unmatched purchase can only be emitted once the watermark proves no
    further view can match, so this op needs a REAL (tight) watermark,
    not the retain-all one: the engine emits the null-extended row when
    the watermark passes the purchase's match horizon, and evicts its
    state in the same move. State per side stays bounded by
    (watermark + within) of event time — the production story at
    100 TB/day, where retain-all would OOM the state store."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("v_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr(within))
    )
    # NOTE: do NOT filter the flush sentinel (p_user < 0) here. A filter
    # on left-side columns is pushed below the left branch's
    # withWatermark by Catalyst, which removes the sentinel BEFORE the
    # watermark node — the purchases-side watermark then never advances
    # past the real data, and under multipleWatermarkPolicy=min the
    # global watermark stalls with it (observed: the last ~30 min of
    # unmatched purchases never null-emit). Sentinel rows are dropped by
    # the caller after materialization.
    return purchases.join(views, cond, "left_outer").select("p_id", "v_id", "p_user")


def chained_window_rollup(
    events: DataFrame,
    inner: str = "30 minutes",
    outer: str = "1 hour",
    watermark: str = "1 hour",
) -> DataFrame:
    """Chained streaming window aggregation (Spark >= 3.5): a fine
    pre-aggregation re-aggregated to a coarser grain INSIDE one
    streaming query — two stateful operators back to back, legal in
    append mode because ``window_time`` re-exposes the inner window's
    event-time column so the watermark propagates through the first
    aggregation into the second.

    This is the streaming rollup cascade a sensor pipeline runs in
    production (30 min partials -> hourly rollup, each tier emitted
    once finalized), and the state win is the point at scale: the
    outer aggregation's state is keyed by (hour, type) over ALREADY
    REDUCED partials — input volume touches only the inner tier.

    Needs a real (tight) watermark, not RETAIN_ALL: append mode emits
    a window only once the watermark passes its end, so the replay
    must advance event time past the data (the flush-sentinel pattern,
    see q_stream_chained_windows).
    """
    inner_agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", inner), "event_type")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum("value").alias("pv"))
    )
    return (
        inner_agg.groupBy(
            F.window(F.window_time("window"), outer), "event_type"
        )
        .agg(F.sum("pn").alias("n"), F.round(F.sum("pv"), 6).alias("value_sum"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )
