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


SESSION_GAP_US = 4 * 3600 * 1_000_000  # 4 h inactivity closes a session


@query(
    "q_ts_sessionize",
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events
        ),
        flagged AS (
            SELECT user_id, event_id, value, us,
                   CASE WHEN lag(us) OVER w IS NULL
                          OR us - lag(us) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        sessioned AS (
            SELECT user_id, value, us,
                   sum(new_sess) OVER (
                       PARTITION BY user_id ORDER BY us, event_id
                       ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               CAST(session_id AS BIGINT)       AS session_id,
               CAST(count(*) AS BIGINT)         AS n_events,
               min(us)                          AS start_us,
               CAST(max(us) - min(us) AS BIGINT) AS duration_us,
               round(sum(value), 2)             AS sum_value
        FROM sessioned GROUP BY user_id, session_id
    """,
    description="Batch sessionization: 4h-gap cut via lag + running sum, per-session rollup",
    tags=("timeseries", "window", "session"),
)
def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch (the classic event-analytics
    shape; the streaming twin is ``q_stream_session``): a lag() gap
    flag, a running sum turning flags into session ids, then a
    per-session rollup. Both windows share one spec, so Spark pays a
    single exchange+sort on user_id; the rollup groupBy reuses the
    same key prefix. Time math stays in integer microseconds
    (``unix_micros``) — `events.ts` is us-aligned, so both engines
    agree bit-for-bit and no float time arithmetic is needed.
    """
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "value", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    lag_us = F.lag("us").over(w)
    flagged = e.withColumn(
        "new_sess",
        F.when(
            lag_us.isNull() | ((F.col("us") - lag_us) > SESSION_GAP_US), 1
        ).otherwise(0),
    )
    sessioned = flagged.withColumn(
        "session_id",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "q_ts_funnel",
    oracle="""
        WITH s AS (
            SELECT user_id, min(epoch_us(ts)) AS su
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        conv AS (
            SELECT s.user_id, min(epoch_us(e.ts)) - su AS lag_us
            FROM s JOIN events e ON e.user_id = s.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > su
            GROUP BY s.user_id, su
        )
        SELECT s.user_id % 8 AS cohort,
               CAST(count(*) AS BIGINT)       AS n_signup,
               CAST(count(lag_us) AS BIGINT)  AS n_converted,
               round(count(lag_us) / CAST(count(*) AS DOUBLE), 6) AS conv_rate,
               CAST(coalesce(sum(lag_us), 0) AS BIGINT) AS total_lag_us
        FROM s LEFT JOIN conv ON s.user_id = conv.user_id
        GROUP BY s.user_id % 8
    """,
    description="Conversion funnel: first signup -> first later purchase, per-cohort rate + total lag",
    tags=("timeseries", "funnel"),
)
def q_ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step conversion funnel: each user's first signup, their
    first purchase strictly after it, per-cohort conversion rate and
    total signup→purchase lag. Lag totals stay integer microseconds
    (BIGINT-exact on both engines — a double sum of large us values
    would be summation-order sensitive); the only double is the final
    small-ratio conversion rate.

    Both stages key on user_id, so the signup aggregate, the purchase
    join, and the conversion aggregate co-partition under one shuffle
    key — at 100 TB the funnel is two user_id exchanges, no broadcast
    needed and no skew (user keys are high-cardinality).
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("su"))
    )
    conv = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", "us"
            ),
            "user_id",
        )
        .filter(F.col("us") > F.col("su"))
        .groupBy("user_id", "su")
        .agg((F.min("us") - F.col("su")).alias("lag_us"))
        .select("user_id", "lag_us")
    )
    return (
        s.join(conv, "user_id", "left")
        .groupBy((F.col("user_id") % 8).alias("cohort"))
        .agg(
            F.count("*").alias("n_signup"),
            F.count("lag_us").alias("n_converted"),
            F.round(F.count("lag_us") / F.count("*").cast("double"), 6).alias(
                "conv_rate"
            ),
            F.coalesce(F.sum("lag_us"), F.lit(0)).cast("long").alias(
                "total_lag_us"
            ),
        )
    )


# Shared by q_ts_session_window (batch session_window) and
# q_stream_session (streaming session_window): the two queries are the
# same semantics on two engines, so a single oracle text keeps a future
# gap/tie-break change from silently checking one twin against stale SQL.
SESSION_GAP_ORACLE = """
        WITH ordered AS (
            SELECT user_id, ts, value, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        tagged AS (
            SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM ordered
        )
        SELECT CAST(min(ts) AS TIMESTAMP)  AS session_start,
               user_id,
               count(*)                    AS n_events,
               round(sum(value), 6)        AS session_value
        FROM tagged
        GROUP BY user_id, sess_id
    """


@query(
    "q_ts_session_window",
    oracle=SESSION_GAP_ORACLE,
    description="Batch session_window aggregation (30m gap) — native gap-merge windows outside streaming",
    tags=("timeseries", "session", "window"),
)
def q_ts_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` in BATCH mode: Spark's gap-merge
    window is not streaming-only, and in batch it replaces the
    lag+running-sum sessionization (q_ts_sessionize) with a single
    aggregation — one shuffle on user_id, merge happens inside the
    aggregation operator, no window-function sort pass. Semantically
    identical to the streaming twin (q_stream_session), so they share
    the relational oracle. Boundary semantics (pinned by
    tests/test_streaming.py::test_session_window_exact_gap_merges):
    Spark's merge is end-inclusive — an event at exactly last_ts + gap
    merges, only gap + 1us splits — which is the oracle's strict
    ``diff > 1800`` new-session condition, on any data."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
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


@query(
    "q_ts_retention",
    oracle="""
        WITH act AS (
            SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
            FROM events WHERE event_type = 'purchase'
        ),
        coh AS (SELECT user_id, min(d) AS cohort_day FROM act GROUP BY user_id)
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, d) AS BIGINT) AS day_offset,
               CAST(count(*) AS BIGINT) AS n_active
        FROM act JOIN coh USING (user_id)
        GROUP BY cohort_day, day_offset
    """,
    description="Cohort retention: first-purchase-day cohorts x day offset -> active-user matrix",
    tags=("timeseries", "retention"),
)
def q_ts_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users cohorted by first purchase day,
    counted on every later active day. distinct → min → self-join →
    count, all keyed on user_id: the activity dedup, the cohort
    aggregate, and the join co-partition on one key, and the final
    matrix aggregation is over the tiny (cohort, offset) key space.
    Purchase-only activity keeps the matrix sparse enough to be a real
    retention curve rather than all-ones.
    """
    act = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("d"))
        .distinct()
    )
    coh = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        act.join(coh, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "q_ts_interpolate",
    oracle="""
        WITH ev AS (
            SELECT date_trunc('hour', ts) AS hour, event_type, value
            FROM events
        ),
        hourly AS (
            SELECT event_type, hour,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS DOUBLE) / 100.0 / count(*) AS v
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
        sparse AS (
            SELECT g.event_type, g.hour, v
            FROM grid g LEFT JOIN hourly USING (event_type, hour)
        ),
        bracketed AS (
            SELECT event_type, hour, v,
                   last_value(v IGNORE NULLS) OVER past  AS pv,
                   last_value(CASE WHEN v IS NOT NULL THEN hour END
                              IGNORE NULLS) OVER past    AS ph,
                   first_value(v IGNORE NULLS) OVER fut  AS nv,
                   first_value(CASE WHEN v IS NOT NULL THEN hour END
                               IGNORE NULLS) OVER fut    AS nh
            FROM sparse
            WINDOW past AS (PARTITION BY event_type ORDER BY hour
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   fut  AS (PARTITION BY event_type ORDER BY hour
                            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, hour,
               CASE WHEN v IS NULL THEN 1 ELSE 0 END AS interpolated,
               CASE
                   WHEN v IS NOT NULL THEN v
                   WHEN pv IS NULL THEN nv
                   WHEN nv IS NULL THEN pv
                   ELSE pv + (nv - pv)
                        * ((epoch(hour) - epoch(ph))
                           / (epoch(nh) - epoch(ph)))
               END AS value_interp
        FROM bracketed
    """,
    description="Linear interpolation over the hourly grid: gap values bracketed by last/next observations",
    tags=("timeseries", "window", "interpolate"),
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other resampling fill next to q_ts_gapfill's zero-fill:
    gap hours take the LINEAR INTERPOLATION between the last and next
    observed hourly averages (boundary gaps extend the nearest
    observation). The bracketing is two IGNORE NULLS window passes —
    last_value over the past frame, first_value over the future frame
    — i.e. one event_type shuffle reused by both frame specs, never a
    self-join per gap.

    At 100 TB the same plan holds per series: the spine join is
    broadcast (grid is tiny), and the two window frames run in one
    pass per partition each. The hourly means accumulate exact integer
    cents divided back (q_agg_group's determinism contract) and the
    interpolation runs an IDENTICAL op sequence on both engines
    (fraction first, then scale), so the output doubles are
    bit-identical with no rounding step at all."""
    ev = load(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type", "value"
    )
    value_c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    hourly = ev.groupBy("event_type", "hour").agg(
        (F.sum(value_c).cast("double") / 100.0 / F.count(F.lit(1))).alias("v")
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
    sparse = grid.join(F.broadcast(hourly), ["event_type", "hour"], "left")
    past = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fut = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hour = F.when(F.col("v").isNotNull(), F.col("hour"))
    b = sparse.select(
        "event_type",
        "hour",
        "v",
        F.last("v", ignorenulls=True).over(past).alias("pv"),
        F.last(obs_hour, ignorenulls=True).over(past).alias("ph"),
        F.first("v", ignorenulls=True).over(fut).alias("nv"),
        F.first(obs_hour, ignorenulls=True).over(fut).alias("nh"),
    )
    frac = (
        F.unix_timestamp("hour") - F.unix_timestamp("ph")
    ).cast("double") / (
        F.unix_timestamp("nh") - F.unix_timestamp("ph")
    ).cast("double")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(F.col("pv") + (F.col("nv") - F.col("pv")) * frac)
    )
    return b.select(
        "event_type",
        "hour",
        F.when(F.col("v").isNull(), 1).otherwise(0).alias("interpolated"),
        interp.alias("value_interp"),
    )


@query(
    "q_ts_gap_islands",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
            FROM events
        ),
        anchored AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS INT) AS anchor
            FROM d
        ),
        islands AS (
            SELECT user_id, anchor,
                   count(*)  AS streak_days,
                   min(day)  AS streak_start
            FROM anchored
            GROUP BY user_id, anchor
        )
        SELECT user_id,
               count(*)                 AS n_islands,
               CAST(max(streak_days) AS BIGINT) AS longest_streak,
               CAST(sum(streak_days) AS BIGINT) AS active_days,
               min(streak_start)        AS first_active_day
        FROM islands
        GROUP BY user_id
    """,
    description="Gaps-and-islands: consecutive-active-day streaks per user (day - row_number anchor)",
    tags=("timeseries", "islands"),
)
def q_ts_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The calendar twin of q_ts_sessionize (which islands by TIME gap):
    consecutive-day activity streaks via the classic day − row_number()
    anchor — consecutive days share an anchor date because both advance
    by one. Everything stays keyed on user_id: one exchange feeds the
    distinct, the window, and both aggregations (AQE preserves the
    partitioning), so at 100 TB this is a single wide dependency plus
    narrow math. Streak comparisons are exact date/int arithmetic —
    nothing floats."""
    d = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    anchored = d.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    islands = anchored.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("streak_days"),
        F.min("day").alias("streak_start"),
    )
    return islands.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.max("streak_days").cast("long").alias("longest_streak"),
        F.sum("streak_days").cast("long").alias("active_days"),
        F.min("streak_start").alias("first_active_day"),
    )


@query(
    "q_ts_outlier_mad",
    oracle="""
        WITH v AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
            FROM events
            WHERE value IS NOT NULL
        ),
        med AS (
            SELECT event_type, quantile_cont(c, 0.5) AS med_c
            FROM v GROUP BY event_type
        ),
        dev AS (
            SELECT v.event_type, v.c, abs(v.c - med.med_c) AS ad
            FROM v JOIN med ON v.event_type = med.event_type
        ),
        mad AS (
            SELECT event_type, quantile_cont(ad, 0.5) AS mad_c
            FROM dev GROUP BY event_type
        )
        SELECT dev.event_type AS event_type,
               round(min(med.med_c) / 100, 6)  AS median_value,
               round(min(mad.mad_c) / 100, 6)  AS mad_value,
               CAST(sum(CASE WHEN dev.ad > 3 * mad.mad_c THEN 1 ELSE 0 END)
                    AS BIGINT)                 AS n_outliers,
               count(*)                        AS n
        FROM dev
        JOIN mad ON dev.event_type = mad.event_type
        JOIN med ON dev.event_type = med.event_type
        GROUP BY dev.event_type
    """,
    description="Robust outlier detection: median absolute deviation per series, 3-MAD rule in exact cents",
    tags=("timeseries", "stats", "outlier"),
)
def q_ts_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAD is the robust scale estimator production monitoring uses
    where stddev is poisoned by the very outliers it should flag. Two
    grouped exact-percentile passes; the per-group medians are
    |event_type| rows, so both rejoins broadcast — the corpus never
    re-shuffles. The boundary hazard (count flips when |v−med| sits
    within an ulp of 3·MAD) is engineered out by working in integer
    CENTS: medians of BIGINTs are exact half-integers in a double, so
    `ad > 3*mad` compares exactly-representable values on both
    engines."""
    v = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
        )
    )
    med = v.groupBy("event_type").agg(
        F.expr("percentile(c, 0.5)").alias("med_c")
    )
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", "c", F.abs(F.col("c") - F.col("med_c")).alias("ad"),
        "med_c",
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(ad, 0.5)").alias("mad_c")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.min("med_c") / 100, 6).alias("median_value"),
            F.round(F.min("mad_c") / 100, 6).alias("mad_value"),
            F.sum(
                F.when(F.col("ad") > 3 * F.col("mad_c"), 1).otherwise(0)
            ).cast("long").alias("n_outliers"),
            F.count(F.lit(1)).alias("n"),
        )
    )


ROLL_CORR_FRAME = 20  # rows preceding => 21-row full frame
ROLL_CORR_MIN_ROWS = ROLL_CORR_FRAME + 1
# population stddev of positions 1..n, exact closed form sqrt((n^2-1)/12);
# embedded as the SAME Python float literal in both engines so the
# divisor is bit-identical.
_ROLL_CORR_SD_RN = float(
    ((ROLL_CORR_MIN_ROWS * ROLL_CORR_MIN_ROWS - 1) / 12.0) ** 0.5
)


@query(
    "q_ts_rolling_corr",
    oracle=f"""
        WITH ranked AS (
            SELECT event_type, ts, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY ts, event_id) AS rn
            FROM events
        ),
        framed AS (
            SELECT event_type, ts, event_id, rn,
                   covar_pop(value, CAST(rn AS DOUBLE)) OVER wf AS cp,
                   stddev_pop(value)                    OVER wf AS sx,
                   avg(value)                           OVER wf AS mv
            FROM ranked
            WINDOW wf AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN {ROLL_CORR_FRAME} PRECEDING
                                   AND CURRENT ROW)
        )
        SELECT event_type, ts, event_id,
               round(cp / nullif(sx * {_ROLL_CORR_SD_RN!r}, 0), 6) AS roll_corr,
               round(mv, 6)                                        AS roll_avg
        FROM framed
        WHERE rn >= {ROLL_CORR_MIN_ROWS} AND event_id % 5 = 0
    """,
    description="Rolling trend strength: windowed Pearson corr(value, position) + moving average",
    tags=("timeseries", "window", "corr"),
)
def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling trend detection per series: Pearson correlation between
    value and its position over a trailing 21-row frame (the "local
    monotonicity" signal: +1 = strictly rising window, -1 = falling),
    plus the moving average on the same frame. The regressor is the
    ROW POSITION, not the raw timestamp — positions are gap-free by
    construction, so inside a FULL frame the regressor's stddev is a
    CONSTANT (closed form sqrt((n^2-1)/12)), embedded as the same
    float literal on both engines, never recomputed per row.
    Correlation is derived from co-moments (covar_pop / stddev)
    exactly like q_agg_corr, so a zero-variance value window yields
    NULL on both engines instead of an ANSI divide error.

    Partial frames (rn < 21) are excluded — their position variance is
    not the constant and tiny frames make the statistic meaningless;
    the output is additionally sliced to event_id % 5 to bound result
    volume WITHOUT affecting any frame (the slice is applied after the
    windows are computed).

    Scale shape: one partition/order spec = ONE exchange + sort on
    event_type; row_number rides the unframed spec and every frame
    aggregate (covar, stddev, avg) shares the framed one, so the whole
    thing is two Window operators over a single sorted run (gated: one
    Exchange). Per-series state is the 21-row frame, O(1) memory. At
    100 TB the parallelism unit is the series key; a production run
    over few huge series would pre-bucket by (series, coarse time) and
    stitch frame boundaries, the standard streaming-window shard.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wf = w.rowsBetween(-ROLL_CORR_FRAME, 0)
    ranked = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.row_number().over(w).alias("rn"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "rn",
        F.covar_pop(F.col("value"), F.col("rn").cast("double")).over(wf).alias("cp"),
        F.stddev_pop("value").over(wf).alias("sx"),
        F.avg("value").over(wf).alias("mv"),
    )
    return ranked.filter(
        (F.col("rn") >= ROLL_CORR_MIN_ROWS) & (F.col("event_id") % 5 == 0)
    ).select(
        "event_type",
        "ts",
        "event_id",
        F.round(
            F.col("cp") / F.nullif(F.col("sx") * F.lit(_ROLL_CORR_SD_RN), F.lit(0.0)),
            6,
        ).alias("roll_corr"),
        F.round("mv", 6).alias("roll_avg"),
    )


EWMA_ALPHA = 0.25
EWMA_HORIZON = 16
# Truncated-EWMA weights (1-alpha)^j, j = 0 (current row) .. horizon-1,
# precomputed as PYTHON floats and embedded as the SAME literals in both
# engines — no pow() at query time, so the only fp ops are mul/add/div
# in mirrored left-to-right order. The tail weight is
# 0.75^15 ~ 0.013 of the head: the truncation error is documented, not
# hidden (a production smoother picks the horizon from alpha).
_EWMA_W = [(1.0 - EWMA_ALPHA) ** j for j in range(EWMA_HORIZON)]
_EWMA_W_SQL = "[" + ", ".join(repr(w) for w in _EWMA_W) + "]"


@query(
    "q_ts_ewma",
    oracle=f"""
        WITH src AS (
            SELECT * FROM events WHERE value IS NOT NULL
        ),
        framed AS (
            SELECT event_type, ts, event_id, value,
                   list(value) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN {EWMA_HORIZON - 1} PRECEDING
                                              AND CURRENT ROW) AS arr
            FROM src
        )
        SELECT event_type, ts, event_id, round(value, 6) AS value,
               round(
                   list_sum(list_transform(range(1, len(arr) + 1),
                       i -> arr[i] * ({_EWMA_W_SQL})[len(arr) - i + 1]))
                   / list_sum(list_transform(range(1, len(arr) + 1),
                       i -> ({_EWMA_W_SQL})[len(arr) - i + 1])),
                   6) AS ewma
        FROM framed
        WHERE event_id % 5 = 0
    """,
    description="Sensor smoothing: truncated exponentially-weighted moving average per series",
    tags=("timeseries", "window", "ewma"),
)
def q_ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per sensor series — THE
    default smoother for noisy sensor streams — in its truncated-
    horizon form: the infinite recursion ewma_t = a*v_t +
    (1-a)*ewma_(t-1) is cut at 16 trailing rows and renormalized by
    the weights actually present, which (a) makes it expressible as a
    pure window + higher-order-function plan with NO recursion and NO
    Python, (b) handles series heads gracefully (a partial frame is a
    properly normalized weighted mean, not a bias), and (c) bounds the
    error by the dropped tail mass (0.75^16 ~ 1% of total weight).

    Determinism contract: the weights are PYTHON float literals
    embedded identically in both engines (no pow() at query time); the
    weighted fold is written left-to-right in frame order on both
    sides, so the only cross-engine fp risk is summation ulps far
    below the 6 dp grid.

    Scale shape: one exchange + sort on the series key; collect_list
    over the 16-row frame is O(horizon) state per row; the weighted
    fold is row-local JVM HOF arithmetic. Output sliced to
    event_id % 5 after the frames are computed. At 100 TB this
    parallelizes by series key like every window op here; the
    truncated form is exactly what makes EWMA shardable at all — the
    exact recursion needs a sequential scan per series, the truncation
    needs only a 16-row overlap between shards.
    """
    # NULL readings are dropped BEFORE the window on both engines:
    # Spark's collect_list silently skips NULLs while DuckDB's list()
    # keeps them in place, so leaving them in would misalign weights
    # and denominators between the two (review s3). Dropping the
    # unmeasurable rows is also the right smoother semantics.
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    wf = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_HORIZON - 1), 0)
    )
    w_arr = "array(" + ", ".join(repr(w) + "D" for w in _EWMA_W) + ")"
    framed = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.collect_list("value").over(wf).alias("arr"),
    )
    num = (
        f"aggregate(sequence(1, size(arr)), 0D, (acc, i) -> "
        f"acc + element_at(arr, i) * element_at({w_arr}, size(arr) - i + 1))"
    )
    den = (
        f"aggregate(sequence(1, size(arr)), 0D, (acc, i) -> "
        f"acc + element_at({w_arr}, size(arr) - i + 1))"
    )
    return framed.filter(F.col("event_id") % 5 == 0).select(
        "event_type",
        "ts",
        "event_id",
        F.round("value", 6).alias("value"),
        F.round(F.expr(num) / F.expr(den), 6).alias("ewma"),
    )


CUSUM_THRESHOLD = 5.0


@query(
    "q_ts_cusum",
    oracle=f"""
        WITH stats AS (
            SELECT event_type,
                   avg(value)        AS mu,
                   stddev_pop(value) AS sigma
            FROM events
            GROUP BY 1
        ),
        cusum AS (
            SELECT e.event_type, e.ts, e.event_id,
                   round(sum((e.value - s.mu) / nullif(s.sigma, 0))
                             OVER (PARTITION BY e.event_type
                                   ORDER BY e.ts, e.event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW), 6) AS s,
                   row_number() OVER (PARTITION BY e.event_type
                                      ORDER BY e.ts DESC, e.event_id DESC)
                       AS rn_desc
            FROM events e JOIN stats s USING (event_type)
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT)                         AS n_points,
               CAST(sum(CASE WHEN abs(s) > {CUSUM_THRESHOLD!r}
                             THEN 1 ELSE 0 END) AS BIGINT)      AS n_alarms,
               round(max(abs(s)), 6) + 0                        AS max_abs_s,
               round(max(CASE WHEN rn_desc = 1 THEN s END), 6) + 0
                                                                AS final_s
        FROM cusum
        GROUP BY event_type
    """,
    description="CUSUM changepoint detection: standardized cumulative drift per series + alarm counts",
    tags=("timeseries", "window", "anomaly"),
)
def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per sensor series: standardize each
    reading against the SERIES mean/stddev, accumulate the running sum
    S_t of standardized deviations, and alarm where |S_t| crosses the
    threshold — the classic Page-style changepoint statistic (a mean
    shift of d sigma grows S_t by d per reading, so small persistent
    drifts alarm fast while zero-mean noise random-walks slowly).
    Reported per series: points, alarms, the peak |S|, and the closing
    S (the drift still open at end-of-data).

    Determinism contract: the alarm predicate compares the 6
    dp-ROUNDED statistic on both engines — S_t is a prefix sum whose
    cross-engine fp drift (~1e-11 over thousands of rows) sits far
    below the rounding grid, so the count can never flip on an ulp;
    `final_s` picks the last row via row_number over the unique
    (ts, event_id) order on both sides (DuckDB's max_by takes no
    composite key). Both reported statistics add `+ 0` after the
    rounding: IEEE `-0.0 + 0.0 = +0.0`, so a closing CUSUM that lands
    on a tiny negative rounds to the SAME signed zero on both engines
    (DuckDB keeps `-0.0` where Spark yields `0.0`; an exact value hash
    distinguishes them even though `-0.0 == 0.0`).

    A zero-variance series yields NULL drift via nullif on both
    engines (never a 0/0 NaN, whose ordering the engines disagree on).

    Scale shape: the per-series moments are a map-side-combined agg
    broadcast back onto the stream (1 row per series); the prefix sum
    is ONE exchange + sort on the series key; the alarm rollup is
    map-side combined. Nothing is quadratic, nothing collects. A
    production deployment computes mu/sigma on a trailing calibration
    window instead of the full series — same plan with a date filter
    on the stats subtree.
    """
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_pop("value").alias("sigma")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cusum = (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "ts",
            "event_id",
            F.round(
                F.sum(
                    (F.col("value") - F.col("mu"))
                    / F.nullif(F.col("sigma"), F.lit(0.0))
                ).over(w),
                6,
            ).alias("s"),
            F.row_number()
            .over(
                Window.partitionBy("event_type").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            )
            .alias("rn_desc"),
        )
    )
    return cusum.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(
            F.when(F.abs("s") > CUSUM_THRESHOLD, 1).otherwise(0)
        ).alias("n_alarms"),
        (F.round(F.max(F.abs("s")), 6) + F.lit(0.0)).alias("max_abs_s"),
        (
            F.round(F.max(F.when(F.col("rn_desc") == 1, F.col("s"))), 6)
            + F.lit(0.0)
        ).alias("final_s"),
    )


@query(
    "q_ts_peak_detect",
    oracle="""
        WITH stats AS (
            SELECT event_type,
                   avg(value) + stddev_pop(value) AS thr
            FROM events GROUP BY 1
        ),
        nbr AS (
            SELECT e.event_type, e.ts, e.event_id, e.value, s.thr,
                   lag(e.value)  OVER w AS prev,
                   lead(e.value) OVER w AS nxt
            FROM events e JOIN stats s USING (event_type)
            WINDOW w AS (PARTITION BY e.event_type ORDER BY e.ts, e.event_id)
        ),
        peaks AS (
            SELECT event_type, ts, event_id, value, thr
            FROM nbr
            WHERE prev IS NOT NULL AND nxt IS NOT NULL
              AND value > prev AND value > nxt
              AND round(value - thr, 6) > 0
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT)  AS n_peaks,
               round(max(value), 6)      AS max_peak,
               round(any_value(thr), 6)  AS threshold
        FROM peaks
        GROUP BY event_type
    """,
    description="Local-maxima peak detection per series with a moment-based prominence floor",
    tags=("timeseries", "window", "anomaly"),
)
def q_ts_peak_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection per sensor series: a reading is a peak when it
    strictly exceeds BOTH neighbors (series boundaries excluded — a
    first/last reading has no two-sided evidence) and clears a
    prominence floor of mean + 1 sigma for its series. Strict
    neighbor comparisons operate on raw parquet doubles (bit-identical
    on both engines); the prominence comparison is the only
    cross-engine-derived boundary, so it compares the 6 dp-ROUNDED
    margin — the moments' fp drift (~1e-14) can never flip a count.

    Scale shape: per-series moments are a map-side-combined agg
    broadcast back (1 row per series); lag/lead ride ONE window spec =
    one exchange + sort on the series key; the peak rollup is map-side
    combined. The neighbor test keeps O(1) state per row — at 100 TB
    this shards by series like every window op here, with a 1-row
    overlap at shard edges.
    """
    ev = load(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        (F.avg("value") + F.stddev_pop("value")).alias("thr")
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    nbr = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "ts",
        "event_id",
        "value",
        "thr",
        F.lag("value").over(w).alias("prev"),
        F.lead("value").over(w).alias("nxt"),
    )
    peaks = nbr.filter(
        F.col("prev").isNotNull()
        & F.col("nxt").isNotNull()
        & (F.col("value") > F.col("prev"))
        & (F.col("value") > F.col("nxt"))
        & (F.round(F.col("value") - F.col("thr"), 6) > 0)
    )
    return peaks.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_peaks"),
        F.round(F.max("value"), 6).alias("max_peak"),
        F.round(F.any_value("thr"), 6).alias("threshold"),
    )


@query(
    "q_ts_seasonal_hod",
    oracle="""
        WITH seasonal AS (
            SELECT event_type, hour(ts) AS hod,
                   avg(value) AS s_mean, count(*) AS n
            FROM events
            GROUP BY 1, 2
        ),
        resid AS (
            SELECT e.event_type, e.value, e.value - s.s_mean AS r
            FROM events e
            JOIN seasonal s
              ON e.event_type = s.event_type AND hour(e.ts) = s.hod
        ),
        strength AS (
            SELECT event_type,
                   var_pop(value) AS v_tot,
                   var_pop(r)     AS v_res
            FROM resid GROUP BY 1
        ),
        peak AS (
            SELECT event_type, s_mean AS peak_mean,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY s_mean DESC, hod ASC) AS rk
            FROM seasonal
        )
        SELECT st.event_type,
               round(st.v_tot, 2)                              AS var_total,
               round(st.v_res, 2)                              AS var_resid,
               round(1 - st.v_res / nullif(st.v_tot, 0), 6)    AS seasonality_strength,
               round(p.peak_mean, 6)                           AS peak_hour_mean
        FROM strength st
        JOIN peak p ON st.event_type = p.event_type AND p.rk = 1
    """,
    description="Hour-of-day seasonal decomposition: profile means, residual variance, seasonality strength",
    tags=("timeseries", "seasonal"),
)
def q_ts_seasonal_hod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical seasonal decomposition, the grouped-profile form: fit
    a 24-slot hour-of-day profile per sensor series, subtract it, and
    report how much variance the profile explains (STL's seasonal
    strength statistic, 1 - Var(residual)/Var(total)) plus the peak
    slot's mean. A strength near 0 says the series has no daily
    rhythm; near 1 says the profile IS the signal — the triage that
    decides whether downstream models need deseasonalizing at all.

    Timestamps reach hour() only through the UTC-pinned session (the
    registry wrapper guarantee), so both engines slot rows
    identically. The peak slot is picked by row_number over
    (mean DESC, hod ASC) — a deterministic tie-break even if two
    hours' means are bit-equal.

    Scale shape: the profile is a map-side-combined agg to
    |series| x 24 rows — broadcast back onto the stream (never a
    shuffle of the stream itself); the residual-variance pass is a
    second map-side agg. Two scans of the fact table (profile fit +
    residual scoring) is the honest cost of any fit-then-score
    decomposition; a production pipeline amortizes the first by
    persisting the profile, exactly like q_llm_dedup_incremental's
    standing index.
    """
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hod"), "value"
    )
    seasonal = ev.groupBy("event_type", "hod").agg(
        F.avg("value").alias("s_mean")
    )
    resid = ev.join(F.broadcast(seasonal), ["event_type", "hod"]).select(
        "event_type", "value", (F.col("value") - F.col("s_mean")).alias("r")
    )
    strength = resid.groupBy("event_type").agg(
        F.var_pop("value").alias("v_tot"), F.var_pop("r").alias("v_res")
    )
    wpk = Window.partitionBy("event_type").orderBy(
        F.col("s_mean").desc(), F.col("hod").asc()
    )
    peak = (
        seasonal.withColumn("rk", F.row_number().over(wpk))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("s_mean").alias("peak_mean"))
    )
    return strength.join(F.broadcast(peak), "event_type").select(
        "event_type",
        F.round("v_tot", 2).alias("var_total"),
        F.round("v_res", 2).alias("var_resid"),
        F.round(
            1 - F.col("v_res") / F.nullif(F.col("v_tot"), F.lit(0.0)), 6
        ).alias("seasonality_strength"),
        F.round("peak_mean", 6).alias("peak_hour_mean"),
    )


MEDIAN_FRAME = 5  # rows each side => 11-row centered frame


@query(
    "q_ts_median_filter",
    oracle=f"""
        SELECT event_type, ts, event_id,
               round(value, 6) AS value,
               round(quantile_cont(value, 0.5)
                         OVER (PARTITION BY event_type
                               ORDER BY ts, event_id
                               ROWS BETWEEN {MEDIAN_FRAME} PRECEDING
                                        AND {MEDIAN_FRAME} FOLLOWING), 6)
                   AS med
        FROM events
        QUALIFY event_id % 5 = 0
    """,
    description="Rolling-median despiking filter: exact centered 11-row median per series",
    tags=("timeseries", "window", "median"),
)
def q_ts_median_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The median filter — signal processing's default despiker,
    because unlike the mean a single glitch sample can NEVER drag the
    output (breakdown point 50%). Centered 11-row frame, exact median:
    over an odd full frame the median IS an order statistic of the raw
    parquet doubles, so both engines return the same bit pattern; only
    the even-sized partial frames at series edges interpolate (the
    same midpoint arithmetic on both sides). That makes this the
    rare float-valued key whose parity holds essentially without
    rounding — the 6 dp round is belt-and-braces for the edge frames.

    Scale shape: one exchange + sort on the series key; the frame
    median keeps an O(frame) buffer per row. The output slice
    (event_id % 5) is applied AFTER the window — Spark evaluates the
    filter above the Window operator (gated), so no frame loses its
    neighbors. A centered filter needs FOLLOWING rows, so at 100 TB
    shards overlap by frame/2 on both edges — still bounded state,
    unlike the unbounded lookahead a sort-based despiker would need.
    """
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-MEDIAN_FRAME, MEDIAN_FRAME)
    )
    return (
        ev.select(
            "event_type",
            "ts",
            "event_id",
            F.round("value", 6).alias("value"),
            F.round(
                F.expr("percentile(value, 0.5)").over(w), 6
            ).alias("med"),
        )
        .filter(F.col("event_id") % 5 == 0)
    )


ACF_LAGS = (1, 24)


@query(
    "q_ts_autocorr",
    oracle=f"""
        WITH lagged AS (
            SELECT event_type, value,
                   lag(value, {ACF_LAGS[0]}) OVER w AS l1,
                   lag(value, {ACF_LAGS[1]}) OVER w AS l24
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        ),
        pairs AS (
            SELECT event_type, {ACF_LAGS[0]} AS lag_k, value, l1 AS lagged
            FROM lagged WHERE l1 IS NOT NULL
            UNION ALL
            SELECT event_type, {ACF_LAGS[1]}, value, l24
            FROM lagged WHERE l24 IS NOT NULL
        )
        SELECT event_type, lag_k,
               CAST(count(*) AS BIGINT) AS n_pairs,
               round(covar_pop(value, lagged)
                     / nullif(stddev_pop(value) * stddev_pop(lagged), 0), 6)
                   AS acf
        FROM pairs
        GROUP BY 1, 2
    """,
    description="Autocorrelation function at lags 1 and 24: periodicity detection per series",
    tags=("timeseries", "window", "acf"),
)
def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The autocorrelation function at a short and a daily-cycle lag —
    the statistic that tells you whether a sensor series has memory
    (ACF(1) high: smooth/trending) and whether it repeats on a daily
    rhythm (ACF(24) high on hourly-ish data) — i.e., whether
    q_ts_seasonal_hod's profile or q_ts_ewma's smoothing will do
    anything useful. Standard Pearson form over the (value, lag-k
    value) pairs, derived from co-moments exactly like q_agg_corr
    (zero-variance series => NULL via nullif, never an engine-specific
    0/0).

    Scale shape: both lag columns ride ONE window spec (one exchange +
    sort per series, O(max lag) state); the pair stream then unpivots
    row-locally (the lag-k axis is data-independent) and reduces in a
    single map-side-combined aggregation over |series| x |lags| keys.
    Nothing is quadratic; at 100 TB the series key is the parallelism
    unit as everywhere in this family.
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "value",
        F.lag("value", ACF_LAGS[0]).over(w).alias("l1"),
        F.lag("value", ACF_LAGS[1]).over(w).alias("l24"),
    )
    pairs = lagged.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(
                    F.lit(ACF_LAGS[0]).alias("lag_k"), F.col("l1").alias("lagged")
                ),
                F.struct(
                    F.lit(ACF_LAGS[1]).alias("lag_k"), F.col("l24").alias("lagged")
                ),
            )
        ).alias("p"),
        "value",
    ).filter(F.col("p.lagged").isNotNull())
    return pairs.groupBy("event_type", F.col("p.lag_k").alias("lag_k")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(
            F.covar_pop(F.col("value"), F.col("p.lagged"))
            / F.nullif(
                F.stddev_pop("value") * F.stddev_pop(F.col("p.lagged")),
                F.lit(0.0),
            ),
            6,
        ).alias("acf"),
    )


@query(
    "q_events_ab_test",
    oracle="""
        WITH assign AS (
            SELECT user_id,
                   CASE WHEN ('0x' || substring(
                            md5(CAST(user_id AS VARCHAR)), 1, 4))::INT
                        / 65536.0 < 0.5
                        THEN 'A' ELSE 'B' END AS variant,
                   max(CASE WHEN event_type = 'purchase'
                            THEN 1 ELSE 0 END) AS converted
            FROM events GROUP BY 1, 2
        ),
        arm AS (
            SELECT variant,
                   count(*)                       AS n_users,
                   sum(converted)                 AS n_converted
            FROM assign GROUP BY variant
        ),
        wide AS (
            SELECT
                max(CASE WHEN variant = 'A' THEN n_users END)     AS na,
                max(CASE WHEN variant = 'A' THEN n_converted END) AS ca,
                max(CASE WHEN variant = 'B' THEN n_users END)     AS nb,
                max(CASE WHEN variant = 'B' THEN n_converted END) AS cb
            FROM arm
        )
        SELECT CAST(na AS BIGINT)            AS n_users_a,
               CAST(nb AS BIGINT)            AS n_users_b,
               CAST(ca AS BIGINT)            AS n_conv_a,
               CAST(cb AS BIGINT)            AS n_conv_b,
               round(ca * 1.0 / na, 6)       AS rate_a,
               round(cb * 1.0 / nb, 6)       AS rate_b,
               round((cb * 1.0 / nb) - (ca * 1.0 / na), 6) AS lift,
               round(((cb * 1.0 / nb) - (ca * 1.0 / na))
                     / nullif(sqrt(((ca + cb) * 1.0 / (na + nb))
                            * (1 - (ca + cb) * 1.0 / (na + nb))
                            * (1.0 / na + 1.0 / nb)), 0), 6) AS z_score
        FROM wide
    """,
    description="A/B experiment readout: hash-assigned variants, per-user conversion, pooled two-proportion z-score",
    tags=("timeseries", "events", "stats"),
)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment analysis over the event stream: users are assigned
    to arms by the md5 unit-fraction idiom (deterministic,
    reprocessing-stable — the same splitter q_llm_split_assign uses),
    conversion is "ever purchased", and the readout is the standard
    pooled two-proportion z-test computed from exact integer counts
    (rates/lift/z rounded on both engines).

    Scale shape: one map-side-combined groupBy(user) for per-user
    conversion, one tiny groupBy(variant), then a 2-row pivot to a
    1-row readout — the z-score arithmetic runs on the driver-free
    1-row frame. At 100 TB the only wide exchange is the user rollup,
    keyed on the experiment's randomization unit."""
    u = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
        ).cast("double")
        / F.lit(65536.0)
    )
    assign = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.when(u < 0.5, "A").otherwise("B").alias("variant"),
            (F.col("event_type") == "purchase").cast("int").alias("is_purch"),
        )
        .groupBy("user_id", "variant")
        .agg(F.max("is_purch").alias("converted"))
    )
    arm = assign.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
    )
    wide = arm.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n_users"))).alias("na"),
        F.max(F.when(F.col("variant") == "A", F.col("n_converted"))).alias("ca"),
        F.max(F.when(F.col("variant") == "B", F.col("n_users"))).alias("nb"),
        F.max(F.when(F.col("variant") == "B", F.col("n_converted"))).alias("cb"),
    )
    na, ca, nb, cb = F.col("na"), F.col("ca"), F.col("nb"), F.col("cb")
    pooled = (ca + cb) / (na + nb)
    return wide.select(
        na.alias("n_users_a"),
        nb.alias("n_users_b"),
        ca.alias("n_conv_a"),
        cb.alias("n_conv_b"),
        F.round(ca / na, 6).alias("rate_a"),
        F.round(cb / nb, 6).alias("rate_b"),
        F.round(cb / nb - ca / na, 6).alias("lift"),
        # pooled = 0 or 1 (every user converted, as on the synthetic
        # fixture, or none) makes the z denominator exactly 0: that is
        # "no variance to test against", so the statistic is NULL —
        # nullif on both engines, not an ANSI divide error.
        F.round(
            (cb / nb - ca / na)
            / F.nullif(
                F.sqrt(pooled * (1 - pooled) * (1 / na + 1 / nb)), F.lit(0.0)
            ),
            6,
        ).alias("z_score"),
    )


@query(
    "q_events_attribution",
    oracle="""
        WITH stream AS (
            SELECT event_type, value,
                   last_value(CASE WHEN event_type = 'click'
                                   THEN date_part('hour', ts) END
                              IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING)  AS click_hour
            FROM events
        )
        SELECT coalesce(click_hour, -1)                  AS click_hour,
               CAST(count(*) AS BIGINT)                  AS n_purchases,
               CAST(sum(CAST(floor(value * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)      AS value_cents
        FROM stream
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
    description="Last-touch attribution: purchases credited to the user's most recent preceding click, rolled up by click hour",
    tags=("timeseries", "window", "events"),
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution — the marketing-analytics primitive: for
    every purchase, find the SAME user's most recent strictly-earlier
    click and credit the purchase's value to that click's hour of day.
    Purchases with no preceding click fall into bucket -1 (organic /
    pre-click conversions — a real funnel metric, not an error path).

    The window frame ends at 1 PRECEDING, so a click and purchase in
    the same event are never self-attributed, and the carried value is
    the ignore-nulls last_value over the user's ordered stream — one
    pass, no self-join of purchases against the full click history
    (the naive formulation, quadratic per heavy user).

    Determinism contract: order is (ts, event_id) — unique on both
    engines; hour-of-day survives the ns→µs parquet truncation; value
    rolls up as exact integer cents.

    Scale shape: one exchange on user_id, per-user ordered scan (users
    are numerous — no giant-partition risk), then a map-side-combined
    agg onto ≤25 hour buckets."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    attributed = ev.select(
        "event_type",
        "value",
        F.last(
            F.when(F.col("event_type") == "click", F.hour("ts")),
            ignorenulls=True,
        )
        .over(w)
        .alias("click_hour"),
    )
    return (
        attributed.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("click_hour", F.lit(-1)).alias("click_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("value_cents"),
        )
    )


@query(
    "q_events_markov",
    oracle="""
        WITH seq AS (
            SELECT event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type
            FROM events
        ),
        counts AS (
            SELECT prev_type, event_type AS next_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE prev_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT prev_type, next_type, n,
               CAST((n * 1000000) // sum(n) OVER (PARTITION BY prev_type)
                    AS BIGINT) AS prob_micros
        FROM counts
    """,
    description="First-order Markov transition matrix of per-user event sequences (counts + row-normalized probabilities)",
    tags=("timeseries", "window", "events"),
)
def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: how often does a click lead to a purchase vs another
    click? The per-user lag() gives (prev, next) bigrams; transition
    probability is the row-normalized count. The output is the
    |types|² matrix every journey-analysis / anomalous-session model
    starts from.

    Determinism contract: sequence order is (ts, event_id); the
    probability is INTEGER micros via bigint floor-division (n*1e6 //
    row_total) — a double division could round x.49999…9 differently
    across engines; integer division cannot.

    Scale shape: one exchange on user_id for the lag, map-side-combined
    count onto ≤|types|² rows, and the row normalization is a window
    over that tiny matrix — driver-free, join-free. At 100 TB the only
    full-data pass is the lag window, same cost class as every
    sessionization in this module."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("next_type"),
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.expr("(n * 1000000) div (sum(n) OVER (PARTITION BY prev_type))")
        .cast("long")
        .alias("prob_micros"),
    )


TIME_BUCKET_S = 5400  # 90-minute hypertable rollup width


@query(
    "q_ts_time_bucket",
    oracle=f"""
        SELECT CAST(to_timestamp((CAST(floor(epoch(ts) / {TIME_BUCKET_S})
                                       AS BIGINT)) * {TIME_BUCKET_S})
                    AS TIMESTAMP)                        AS bucket_start,
               event_type,
               CAST(count(*) AS BIGINT)                  AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)      AS value_cents
        FROM events
        GROUP BY 1, 2
    """,
    description=f"Arbitrary-width time-bucket rollup ({TIME_BUCKET_S // 60}-minute hypertable buckets) via Spark window()",
    tags=("timeseries", "aggregate"),
)
def q_ts_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hypertable rollup at a width no calendar date_trunc offers:
    90-minute buckets via Spark's ``window(ts, '90 minutes')``, whose
    documented origin is the 1970 epoch — so a bucket's start IS
    to_timestamp(floor(epoch/5400)*5400), which is exactly what the
    oracle computes and what a TimescaleDB-style time_bucket returns
    for an epoch-aligned origin. This key pins that equivalence: if a
    Spark upgrade ever moved window()'s origin, the hash would flip.

    Value rolls up as exact integer cents (order-independent, the
    q_agg_group contract). Scale shape: one map-side-combined groupBy
    on (bucket, type) — the bucket is computed row-locally, so the
    rollup is as cheap as any hash aggregate and partition-prunes when
    the table is date-partitioned."""
    ev = load(spark, sf_dir, "events")
    value_c = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.groupBy(
            F.window("ts", f"{TIME_BUCKET_S} seconds").start.alias(
                "bucket_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_c).alias("value_cents"),
        )
    )


@query(
    "q_ts_cohort_ltv",
    oracle="""
        WITH first_order AS (
            SELECT o_custkey,
                   min(date_part('year', o_orderdate)) AS cohort_yr
            FROM orders GROUP BY 1
        )
        SELECT CAST(f.cohort_yr AS BIGINT)                       AS cohort_yr,
               CAST(date_part('year', o.o_orderdate) - f.cohort_yr
                    AS BIGINT)                                   AS yrs_since,
               CAST(count(DISTINCT o.o_custkey) AS BIGINT)       AS n_active,
               CAST(count(*) AS BIGINT)                          AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)              AS revenue_cents
        FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
        GROUP BY 1, 2
    """,
    description="Cohort LTV matrix: first-order-year cohorts x years-since, active customers + revenue per cell",
    tags=("timeseries", "aggregate", "cohort"),
)
def q_ts_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix — the retention economics readout:
    customers grouped by FIRST-order year, each later order credited to
    (cohort, years since acquisition). Reading a row left-to-right is a
    cohort aging; reading a diagonal is a calendar year. The
    q_ts_retention twin with money attached — retention says who came
    back, this says what they were worth.

    Scale shape: one groupBy for first-order year (map-side combined),
    one co-partitioned self-join back onto orders on custkey (both
    sides shuffle once; at scale both bucket by custkey), one rollup
    onto the tiny (cohort, age) grid — distinct-customer partials
    bounded per cell by cohort size. Revenue is exact integer cents.
    """
    orders = load(spark, sf_dir, "orders")
    first = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.min(F.year("o_orderdate")).alias("cohort_yr")
    )
    return (
        orders.join(first, orders.o_custkey == first.ck)
        .groupBy(
            F.col("cohort_yr").cast("long").alias("cohort_yr"),
            (F.year("o_orderdate") - F.col("cohort_yr"))
            .cast("long")
            .alias("yrs_since"),
        )
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("revenue_cents"),
        )
    )


# Centered delta for the drawdown walk: events.value is positive
# (~U(0, 100) around a ~50 mean), so the raw cumulative sum is monotone
# and its drawdown trivially 0; subtracting a FIXED base (never a
# data-derived mean — that would couple every row to a global
# aggregate) turns the series into a signed random walk with real
# peaks and troughs. Cents keep every intermediate BIGINT-exact.
DRAWDOWN_BASE_CENTS = 5000
# Two-level chunking of the event_id order (operators/ranking module
# doc): event_id is a dense unique BIGINT, so floor(id / CHUNK) is a
# monotone coarsening with bounded chunk population.
DRAWDOWN_CHUNK = 1024


@query(
    "q_ts_drawdown",
    oracle=f"""
        WITH v AS (
            SELECT event_type, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT)
                   - {DRAWDOWN_BASE_CENTS} AS delta
            FROM events
        ),
        c AS (
            SELECT event_type, event_id, delta,
                   sum(delta) OVER (
                       PARTITION BY event_type ORDER BY event_id) AS cum
            FROM v
        ),
        r AS (
            SELECT event_type, delta, cum,
                   max(cum) OVER (
                       PARTITION BY event_type ORDER BY event_id) AS run_max
            FROM c
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT)        AS n_events,
               CAST(sum(delta) AS BIGINT)      AS final_cents,
               CAST(max(cum) AS BIGINT)        AS peak_cents,
               CAST(max(run_max - cum) AS BIGINT) AS max_drawdown_cents
        FROM r
        GROUP BY event_type
    """,
    description="Maximum drawdown per series: running peak minus cumulative value over the event_id order, exact integer cents via a TWO-LEVEL prefix sum + running max (no single-partition window)",
    tags=("timeseries", "window", "finance"),
)
def q_ts_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max drawdown (the canonical risk statistic: largest peak-to-
    trough fall of the cumulative series) per event_type, exact cents.

    Scale shape: the naive plan is ONE window per event_type ordered
    by event_id — with 5 event types that is 5 partitions holding the
    whole table (the few-huge-partitions trap, q_agg_gini's). Both
    running statistics here are two-level decomposable, so the kernel
    follows operators/ranking's pattern: (1) a window per
    (event_type, id-chunk) computes bounded-size LOCAL prefix sums and
    local running maxes; (2) the per-chunk totals aggregate to a small
    chunk table whose exclusive prefix sum/max broadcast back as each
    chunk's offset and prior-peak; (3) the global running max at any
    row is greatest(prior chunks' peak, chunk offset + local running
    max) — exact, and every window is bounded by DRAWDOWN_CHUNK.
    """
    v = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        (
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            - DRAWDOWN_BASE_CENTS
        ).alias("delta"),
        F.floor(F.col("event_id") / DRAWDOWN_CHUNK).alias("chunk"),
    )
    w_in = (
        Window.partitionBy("event_type", "chunk")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = v.withColumn("lcum", F.sum("delta").over(w_in))
    local = local.withColumn("lrunmax", F.max("lcum").over(w_in))

    w_prev = (
        Window.partitionBy("event_type")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunk_tbl = (
        local.groupBy("event_type", "chunk")
        .agg(
            F.sum("delta").alias("c_sum"),
            F.max("lcum").alias("c_maxcum"),
        )
        .withColumn("offset", F.coalesce(F.sum("c_sum").over(w_prev), F.lit(0)))
        .withColumn(
            "prev_peak",
            F.max(F.col("offset") + F.col("c_maxcum")).over(w_prev),
        )
        .select("event_type", "chunk", "offset", "prev_peak")
    )
    j = local.join(F.broadcast(chunk_tbl), ["event_type", "chunk"])
    cum = F.col("offset") + F.col("lcum")
    run_max = F.greatest(
        F.coalesce(F.col("prev_peak"), F.lit(-(2**62))),
        F.col("offset") + F.col("lrunmax"),
    )
    return j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("delta").alias("final_cents"),
        F.max(cum).alias("peak_cents"),
        F.max(run_max - cum).alias("max_drawdown_cents"),
    )


@query(
    "q_events_streaks",
    oracle="""
        WITH d AS (
            SELECT DISTINCT user_id,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
            FROM events
        ),
        r AS (
            SELECT user_id, day_num,
                   day_num - row_number() OVER (
                       PARTITION BY user_id ORDER BY day_num) AS island
            FROM d
        ),
        s AS (
            SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
            FROM r GROUP BY user_id, island
        )
        SELECT user_id,
               CAST(sum(len) AS BIGINT) AS active_days,
               CAST(count(*) AS BIGINT) AS n_streaks,
               CAST(max(len) AS BIGINT) AS longest_streak
        FROM s
        GROUP BY user_id
    """,
    description="Longest consecutive-day activity streak per user (gaps-and-islands: day_num minus per-user row_number groups runs)",
    tags=("timeseries", "window", "sessionize"),
)
def q_events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands streak detection: distinct active days per
    user, island id = day_num - row_number (constant within each
    consecutive run), streak lengths per island, per-user summary.

    Scale shape: one distinct on (user, day) (map-side combinable),
    one window partitioned by user_id over day-count-bounded rows
    (365/user/yr — never a huge partition), two algebraic groupBys.
    Day arithmetic is integer day numbers from a fixed epoch on both
    engines — no timestamp subtraction, no tz dependence (the registry
    wrapper pins UTC)."""
    d = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_num"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    islands = d.withColumn(
        "island", F.col("day_num") - F.row_number().over(w)
    )
    s = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    return s.groupBy("user_id").agg(
        F.sum("len").alias("active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


@query(
    "q_ts_vwap",
    oracle="""
        SELECT CAST(year(l_shipdate) AS BIGINT)  AS yr,
               CAST(month(l_shipdate) AS BIGINT) AS mo,
               CAST(count(*) AS BIGINT)          AS n,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT)                   AS qty_centi,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT)                   AS price_cents,
               CAST(CASE
                    WHEN sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 0
                     AND sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) >= 0
                    THEN (CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                               AS BIGINT)) AS HUGEINT) * 1000000)
                         // sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    END AS BIGINT)               AS vwap_micros
        FROM lineitem
        GROUP BY year(l_shipdate), month(l_shipdate)
    """,
    description="Volume-weighted average price per ship month: exact integer cents/centi-units, VWAP as BIGINT floor-division micros (never a double divide)",
    tags=("timeseries", "aggregate", "finance"),
)
def q_ts_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP = sum(price)/sum(quantity) per calendar bucket — the
    weighted-average family member the OHLC key doesn't cover. All
    accumulation is integer (cents / centi-units); the ratio is BIGINT
    floor division scaled to micros, so the result is hash-exact on
    both engines. GUARDED to non-negative numerator / positive
    denominator: Spark's ``div`` truncates toward zero while DuckDB's
    ``//`` floors, so a negative quotient is a guaranteed one-sided
    divergence, and a zero-quantity bucket raises in DuckDB — both
    yield NULL instead (hostile-fixture class, test_edge_values). One
    map-side-combinable aggregation; the shuffle carries one row per
    (year, month)."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long")
    price = F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("long")
    return (
        li.groupBy(
            F.year("l_shipdate").cast("long").alias("yr"),
            F.month("l_shipdate").cast("long").alias("mo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(qty).alias("qty_centi"),
            F.sum(price).alias("price_cents"),
        )
        .withColumn(
            "vwap_micros",
            # 128-bit-wide numerator on BOTH engines (DECIMAL(38,0) /
            # HUGEINT): a 1e14-cents bucket times 1e6 overflows BIGINT
            # (hostile-fixture class); operands are guarded positive so
            # floor and truncate coincide.
            F.when(
                (F.col("qty_centi") > 0) & (F.col("price_cents") >= 0),
                F.expr(
                    "(CAST(price_cents AS DECIMAL(38,0)) * 1000000)"
                    " div qty_centi"
                ),
            ).cast("long"),
        )
    )


PATH_TOP_K = 10


@query(
    "q_events_path_topk",
    oracle=f"""
        WITH p AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   string_agg(event_type, '>' ORDER BY event_id) AS path
            FROM events
            GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT path,
               CAST(count(*) AS BIGINT)              AS n_sessions,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM p
        GROUP BY path
        ORDER BY n_sessions DESC, path
        LIMIT {PATH_TOP_K}
    """,
    description="Top-k most common per-user-day event paths: ordered path strings (event_id order — tie-free and truncation-immune), session + distinct-user counts, TakeOrdered cut",
    tags=("timeseries", "aggregate", "funnel"),
)
def q_events_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis — the "what do users actually do in a day"
    complement of the fixed-pattern funnel: each (user, day) session
    becomes its ordered event-type string, and the most common paths
    rank by frequency. Ordering is by event_id (globally unique
    BIGINT), NEVER raw ts: the fixture's nanosecond timestamps
    truncate to micros on the Spark side only, so a ts order could
    legally disagree between engines on within-microsecond ties, while
    the unique key cannot.

    Scale shape: one groupBy (user, day) whose collect_list is bounded
    by per-day activity (array_sort on structs -> JVM-side transform +
    array_join, no Python), one map-side-combinable path count
    (count_distinct over user partials), TakeOrdered for the cut."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_id",
        "event_type",
    )
    p = ev.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(PATH_TOP_K)
    )


SEQ_FIRST, SEQ_THEN = "view", "purchase"


@query(
    "q_events_sequence_next",
    oracle=f"""
        WITH s AS (
            SELECT user_id, CAST(ts AS DATE) AS day, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY event_id) AS next_type
            FROM events
        )
        SELECT day,
               CAST(count(*) AS BIGINT) AS n_immediate,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM s
        WHERE event_type = '{SEQ_FIRST}' AND next_type = '{SEQ_THEN}'
        GROUP BY day
    """,
    description=f"Strict-adjacency sequence match: '{SEQ_FIRST}' IMMEDIATELY followed by '{SEQ_THEN}' in the per-user event_id order (lead-based, unlike the funnel's first-after semantics), daily conversion counts",
    tags=("timeseries", "window", "funnel"),
)
def q_events_sequence_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite: the A-immediately-then-B pattern via
    lead() over the per-user sequence — strict adjacency, which the
    funnel key (first B any time after first A) cannot express. The
    sequence order is event_id (globally unique), immune to the
    fixture's ns->us timestamp truncation. One window exchange keyed
    on user_id (bounded per-user partitions), one map-side-combinable
    daily rollup; distinct-user partials bounded by user cardinality."""
    w = Window.partitionBy("user_id").orderBy("event_id")
    s = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "event_type",
        "event_id",
    )
    s = s.withColumn("next_type", F.lead("event_type").over(w))
    return (
        s.filter(
            (F.col("event_type") == SEQ_FIRST)
            & (F.col("next_type") == SEQ_THEN)
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_immediate"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


FUNNEL_A, FUNNEL_B, FUNNEL_C = "view", "click", "purchase"
FUNNEL_GAP_S = 86400  # per-step timeout (whole seconds)


@query(
    "q_events_pattern_funnel",
    oracle=f"""
        WITH f AS (
            SELECT user_id, event_id, event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec,
                   CAST(ts AS DATE) AS day
            FROM events
            WHERE event_type IN ('{FUNNEL_A}', '{FUNNEL_B}', '{FUNNEL_C}')
        ),
        s AS (
            SELECT *,
                   lead(event_type, 1) OVER w AS t1,
                   lead(event_type, 2) OVER w AS t2,
                   lead(sec, 1) OVER w AS s1,
                   lead(sec, 2) OVER w AS s2
            FROM f WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
        )
        SELECT day,
               CAST(count(*) AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN t1 = '{FUNNEL_B}'
                                  AND s1 - sec <= {FUNNEL_GAP_S}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_ab,
               CAST(sum(CASE WHEN t1 = '{FUNNEL_B}'
                                  AND s1 - sec <= {FUNNEL_GAP_S}
                                  AND t2 = '{FUNNEL_C}'
                                  AND s2 - s1 <= {FUNNEL_GAP_S}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_abc,
               CAST(count(DISTINCT CASE WHEN t1 = '{FUNNEL_B}'
                                             AND s1 - sec <= {FUNNEL_GAP_S}
                                             AND t2 = '{FUNNEL_C}'
                                             AND s2 - s1 <= {FUNNEL_GAP_S}
                                        THEN user_id END) AS BIGINT)
                   AS n_users_converted
        FROM s WHERE event_type = '{FUNNEL_A}'
        GROUP BY day
    """,
    description=f"k-step pattern funnel with per-step timeout ({FUNNEL_A}->{FUNNEL_B}->{FUNNEL_C}, each hop <= {FUNNEL_GAP_S}s): chained lead()s over the per-user step-filtered event_id order; per-day attrition counts, all integer",
    tags=("timeseries", "window", "funnel"),
)
def q_events_pattern_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-lite, generalized to k steps with timeouts
    (VERDICT r11 item 5): restrict the stream to the funnel's step
    types, order per user by event_id (globally unique — immune to the
    ns->us truncation), and a completed instance is A at position i,
    B at i+1, C at i+2 of the FILTERED subsequence with each hop's
    whole-second gap within FUNNEL_GAP_S. Two chained lead()s expose
    the next two steps and their times, so per-day attrition (n_a ->
    n_ab -> n_abc) is one pass — the clickstream report the
    first-after funnel (q_ts_funnel) and the strict-adjacency matcher
    (q_events_sequence_next) bracket but can't express.

    Scale shape: the step filter prunes the scan before the one window
    exchange (user_id partitions, bounded per user); lead() is
    O(1)/row; the daily rollup is map-side combinable; distinct
    converted-user partials are bounded by user cardinality. Whole-
    second floors keep every comparison integer-exact on both engines."""
    steps = [FUNNEL_A, FUNNEL_B, FUNNEL_C]
    w = Window.partitionBy("user_id").orderBy("event_id")
    f = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(steps))
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.floor(F.unix_timestamp("ts")).cast("long").alias("sec"),
            F.to_date("ts").alias("day"),
        )
    )
    s = (
        f.withColumn("t1", F.lead("event_type", 1).over(w))
        .withColumn("t2", F.lead("event_type", 2).over(w))
        .withColumn("s1", F.lead("sec", 1).over(w))
        .withColumn("s2", F.lead("sec", 2).over(w))
    )
    ab = (F.col("t1") == FUNNEL_B) & (
        F.col("s1") - F.col("sec") <= FUNNEL_GAP_S
    )
    abc = (
        ab
        & (F.col("t2") == FUNNEL_C)
        & (F.col("s2") - F.col("s1") <= FUNNEL_GAP_S)
    )
    return (
        s.filter(F.col("event_type") == FUNNEL_A)
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_a"),
            F.sum(F.when(ab, 1).otherwise(0)).alias("n_ab"),
            F.sum(F.when(abc, 1).otherwise(0)).alias("n_abc"),
            F.count_distinct(F.when(abc, F.col("user_id"))).alias(
                "n_users_converted"
            ),
        )
    )


HIST2D_VALUE_BIN_CENTS = 5000  # 50-unit value bins, exact integer cents


@query(
    "q_agg_hist2d",
    oracle=f"""
        SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(floor(value * 100 + 0.5) AS BIGINT)
                   // {HIST2D_VALUE_BIN_CENTS} AS value_bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS cents_total
        FROM events
        GROUP BY 1, 2
    """,
    description="2-D histogram (hour-of-day x integer value bin): the heatmap primitive as one map-side-combined groupBy; bins from exact cents floor-division, never float bucketing",
    tags=("aggregate", "histogram"),
)
def q_agg_hist2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint distribution over two axes — the heatmap behind every
    "when do high-value events happen" dashboard. Bin edges are exact
    integer arithmetic (cents div width; hour() of the UTC-pinned
    timestamp), so bucket membership can never flip between engines
    the way float-multiplied edges can. One aggregation, shuffle
    bounded by 24 x value-range/width cells regardless of input."""
    ev = load(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return (
        ev.select(
            F.hour("ts").cast("long").alias("hour_of_day"),
            F.expr(
                f"(cast(floor(value * 100 + 0.5d) as bigint))"
                f" div {HIST2D_VALUE_BIN_CENTS}"
            ).alias("value_bin"),
            cents.alias("cents"),
        )
        .groupBy("hour_of_day", "value_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("cents_total"),
        )
    )


IAT_BUCKET_S = 600  # 10-minute inter-arrival histogram buckets
IAT_DAY_CHUNK = 86400  # two-level lag: one chunk per whole-second day


@query(
    "q_events_inter_arrival",
    oracle=f"""
        WITH o AS (
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
            FROM events
        ),
        d AS (
            SELECT event_type,
                   sec - lag(sec) OVER (
                       PARTITION BY event_type ORDER BY sec, event_id) AS gap
            FROM o
        )
        SELECT event_type,
               CAST(gap // {IAT_BUCKET_S} AS BIGINT) AS gap_bucket,
               CAST(count(*) AS BIGINT)              AS n,
               CAST(sum(gap) AS BIGINT)              AS gap_total_s
        FROM d WHERE gap IS NOT NULL
        GROUP BY event_type, gap // {IAT_BUCKET_S}
    """,
    description="Inter-arrival-time histogram per event type (10-min buckets, whole seconds): TWO-LEVEL lag — within-day windows plus a broadcast day-boundary stitch — never a whole-table window per type",
    tags=("timeseries", "window", "histogram"),
)
def q_events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process profile — the burstiness/SLA screen run before
    sizing stream consumers. Timestamps enter as FLOOR-OF-EPOCH whole
    seconds: flooring to seconds absorbs the fixture's ns->us
    truncation asymmetry (the gotcha that bans raw sub-second ts
    arithmetic), and (sec, event_id) is a deterministic total order on
    both engines.

    Scale shape: lag() partitioned by event_type alone would put the
    whole table in 5 partitions, so the lag is TWO-LEVEL like
    q_ts_drawdown: within-(type, day) windows compute bounded local
    lags, and each day's first gap is stitched from the previous day's
    max second via a lag over the tiny (type, day) chunk table,
    broadcast back. The histogram is one map-side-combined groupBy."""
    o = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.floor(F.unix_timestamp("ts")).cast("long").alias("sec"),
    )
    o = o.withColumn("day", F.expr(f"sec div {IAT_DAY_CHUNK}"))
    w_in = Window.partitionBy("event_type", "day").orderBy("sec", "event_id")
    local = o.withColumn("prev_in", F.lag("sec").over(w_in))
    w_days = Window.partitionBy("event_type").orderBy("day")
    chunk = (
        o.groupBy("event_type", "day")
        .agg(F.max("sec").alias("day_max"))
        .withColumn("prev_day_max", F.lag("day_max").over(w_days))
        .select("event_type", "day", "prev_day_max")
    )
    gaps = (
        local.join(F.broadcast(chunk), ["event_type", "day"])
        .select(
            "event_type",
            (
                F.col("sec")
                - F.coalesce("prev_in", "prev_day_max")
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    return gaps.groupBy(
        "event_type",
        F.expr(f"gap div {IAT_BUCKET_S}").cast("long").alias("gap_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap").alias("gap_total_s"),
    )


@query(
    "q_events_anomaly_days",
    oracle="""
        WITH d AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS x
            FROM events GROUP BY 1, 2
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT)     AS n,
                   CAST(sum(x) AS BIGINT)       AS sx,
                   CAST(sum(x * x) AS BIGINT)   AS sq
            FROM d GROUP BY event_type
        )
        SELECT d.event_type,
               s.n AS n_days,
               CAST(sum(CASE WHEN (d.x * s.n - s.sx) * (d.x * s.n - s.sx)
                                  > 4 * (s.n * s.sq - s.sx * s.sx)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalous,
               CAST(min(d.x) AS BIGINT) AS min_daily,
               CAST(max(d.x) AS BIGINT) AS max_daily,
               s.sx AS events_total
        FROM d JOIN s ON s.event_type = d.event_type
        GROUP BY d.event_type, s.n, s.sx
    """,
    description="Daily-rate anomaly days per event type: the 2-sigma z-test algebraically squared into PURE BIGINT form ((x*n - S)^2 > 4*(n*Q - S^2)) — no mean, no sqrt, no float anywhere",
    tags=("timeseries", "aggregate", "audit"),
)
def q_events_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly screen: which days' event counts sit more than 2
    population standard deviations from that type's mean. The test is
    |x - mean| > 2*sigma, which cross-multiplies into the INTEGER
    inequality (x*n - S)^2 > 4*(n*Q - S^2) with S = sum(x), Q =
    sum(x^2) — exact on both engines with no division, no sqrt, no
    float representation anywhere (the q_agg_moments cancellation
    trap never arises because nothing is ever a float).

    Scale shape: one map-side-combined daily rollup, one tiny
    per-type power-sum aggregate broadcast back onto the day table,
    one final per-type count. Day-table cardinality = days x types —
    control-plane sized at any corpus scale."""
    d = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
    )
    s = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sq"),
    )
    j = d.join(F.broadcast(s), "event_type")
    anom = (
        (F.col("x") * F.col("n") - F.col("sx"))
        * (F.col("x") * F.col("n") - F.col("sx"))
    ) > 4 * (F.col("n") * F.col("sq") - F.col("sx") * F.col("sx"))
    return j.groupBy("event_type", "n", "sx").agg(
        F.sum(F.when(anom, 1).otherwise(0)).alias("n_anomalous"),
        F.min("x").alias("min_daily"),
        F.max("x").alias("max_daily"),
    ).select(
        "event_type",
        F.col("n").alias("n_days"),
        "n_anomalous",
        "min_daily",
        "max_daily",
        F.col("sx").alias("events_total"),
    )


# Concurrency sweep: each event is active for a fixed lease after its
# start; both boundary points of an interval stay in the START's day
# (per-day rollup of sessions started that day). Chunk = hour-of-epoch,
# so every window is bounded by one hour of boundary points.
CONCURRENCY_LEASE_S = 300
CONCURRENCY_CHUNK_S = 3600


@query(
    "q_events_concurrency",
    oracle=f"""
        WITH pts AS (
            SELECT CAST(ts AS DATE) AS day,
                   epoch_us(ts) // 1000000 AS t, 1 AS delta, event_id
            FROM events
            UNION ALL
            SELECT CAST(ts AS DATE) AS day,
                   epoch_us(ts) // 1000000 + {CONCURRENCY_LEASE_S} AS t,
                   -1 AS delta, event_id
            FROM events
        ),
        run AS (
            SELECT day, delta,
                   sum(delta) OVER (
                       PARTITION BY day
                       ORDER BY t, delta, event_id) AS active
            FROM pts
        )
        SELECT day,
               CAST(max(active) AS BIGINT)      AS max_concurrent,
               CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END)
                    AS BIGINT)                  AS n_started
        FROM run
        GROUP BY day
    """,
    description="Peak concurrency per day: interval-boundary sweep (+1 at start, -1 at lease end) with a two-level chunked running sum — no whole-day single-partition window on the Spark side",
    tags=("timeseries", "events", "window"),
)
def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent activity per day — the capacity-planning number
    (max simultaneous sessions/devices) every sensor fleet dashboard
    leads with. Each event holds a fixed 300 s lease; the sweep puts
    +1 at the start and -1 at the lease end, orders boundary points by
    (t, delta, event_id) — ends sort before starts at the same instant
    (half-open [s, e) intervals), and the trailing event_id makes the
    prefix sequence fully deterministic — and takes the max running
    sum. Both boundary points stay in the start's day, so a day reads
    "peak concurrency of sessions started that day".

    Scale shape: the oracle's per-day window would put one whole day
    in one partition — the few-huge-partitions trap. The running sum
    is prefix-decomposable, so the kernel is q_ts_drawdown's two-level
    pattern: bounded local windows per (day, hour-chunk), a tiny
    per-chunk total table whose exclusive prefix sum is each chunk's
    offset, and the day's peak = max over chunks of (offset + local
    running max) — computed without ever joining back to the points.
    Every window is bounded by one hour of boundaries. No Python."""
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        F.unix_timestamp("ts").alias("s"),
        "event_id",
    )
    pts = ev.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionAll(
        ev.select(
            "day",
            (F.col("s") + CONCURRENCY_LEASE_S).alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    pts = pts.withColumn(
        "chunk", F.floor(F.col("t") / CONCURRENCY_CHUNK_S)
    )
    w_in = (
        Window.partitionBy("day", "chunk")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = pts.withColumn("lrun", F.sum("delta").over(w_in))
    chunk_tbl = local.groupBy("day", "chunk").agg(
        F.sum("delta").alias("c_sum"),
        F.max("lrun").alias("c_maxrun"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("c_started"),
    )
    w_prev = (
        Window.partitionBy("day")
        .orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = chunk_tbl.withColumn(
        "offset", F.coalesce(F.sum("c_sum").over(w_prev), F.lit(0))
    )
    return offs.groupBy("day").agg(
        F.max(F.col("offset") + F.col("c_maxrun")).alias("max_concurrent"),
        F.sum("c_started").alias("n_started"),
    )


@query(
    "q_events_step_latency",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS st
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        conv AS (
            SELECT s.user_id, CAST(s.st AS DATE) AS cohort_day,
                   min((epoch_us(e.ts) - epoch_us(s.st)) // 1000000) AS lat_s
            FROM s JOIN events e ON e.user_id = s.user_id
            WHERE e.event_type = 'purchase' AND e.ts > s.st
            GROUP BY 1, 2
        ),
        r AS (
            SELECT cohort_day, lat_s,
                   row_number() OVER (
                       PARTITION BY cohort_day
                       ORDER BY lat_s, user_id) AS rn,
                   count(*) OVER (PARTITION BY cohort_day) AS n
            FROM conv
        )
        SELECT cohort_day,
               CAST(max(n) AS BIGINT)  AS n_converted,
               CAST(min(lat_s) AS BIGINT) AS min_latency_s,
               CAST(max(CASE WHEN rn = (n + 1) // 2 THEN lat_s END)
                    AS BIGINT)         AS median_latency_s,
               CAST(max(CASE WHEN rn = n - (n * 10 // 100) THEN lat_s END)
                    AS BIGINT)         AS p90_latency_s,
               CAST(max(lat_s) AS BIGINT) AS max_latency_s
        FROM r
        GROUP BY cohort_day
    """,
    description="Signup->purchase conversion latency distribution per signup-day cohort: exact discrete median/p90 via per-cohort rank, integer seconds",
    tags=("timeseries", "funnel", "percentile"),
)
def q_events_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — q_ts_funnel reports WHETHER users
    convert; product teams then ask HOW FAST, per signup-day cohort.
    Latency is integer epoch seconds; the median is the exact lower
    median (rank (n+1)//2) and p90 the exact rank n - n*10//100
    element — discrete order statistics picked by row_number with a
    (lat_s, user_id) tiebreak, identical on both engines, not an
    interpolated percentile whose fractional arithmetic could drift.

    Scale shape: signup min-agg, purchase join, and conversion min-agg
    all co-partition on user_id (one shuffle key, high cardinality, no
    skew). The per-cohort rank rides operators/ranking's two-level
    chunked row_number (latency-range chunks — monotone in the
    (lat_s, user_id) order), so no cohort ever owns a whole-day sort
    partition; cohort sizes come from a broadcast count table instead
    of a count window over the same partition."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    conv = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("ts").alias("pt")
            ),
            "user_id",
        )
        .filter(F.col("pt") > F.col("st"))
        .groupBy("user_id", F.col("st").cast("date").alias("cohort_day"))
        .agg(
            F.min(
                F.expr("(unix_micros(pt) - unix_micros(st)) div 1000000")
            ).alias("lat_s")
        )
    )
    from .ranking import chunked_row_number

    ranked = chunked_row_number(
        conv.select("cohort_day", "lat_s", "user_id"),
        ["lat_s", "user_id"],
        [(F.floor(F.col("lat_s") / 3600)).cast("long")],
        part_cols=["cohort_day"],
        rank_name="rn",
    )
    n_tbl = conv.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n"))
    r = ranked.join(F.broadcast(n_tbl), "cohort_day").select(
        "cohort_day", "lat_s", "rn", "n"
    )
    median_rn = F.expr("(n + 1) div 2")
    p90_rn = F.expr("n - (n * 10 div 100)")
    return r.groupBy("cohort_day").agg(
        F.max("n").alias("n_converted"),
        F.min("lat_s").alias("min_latency_s"),
        F.max(F.when(F.col("rn") == median_rn, F.col("lat_s"))).alias(
            "median_latency_s"
        ),
        F.max(F.when(F.col("rn") == p90_rn, F.col("lat_s"))).alias(
            "p90_latency_s"
        ),
        F.max("lat_s").alias("max_latency_s"),
    )


SAX_ALPHABET = 4


@query(
    "q_ts_sax",
    oracle=f"""
        WITH sym AS (
            SELECT user_id, CAST(ts AS DATE) AS day, event_id,
                   chr(96 + CAST(ntile({SAX_ALPHABET}) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(floor(value * 1e6 + 0.5) AS BIGINT),
                                event_id) AS INT)) AS s
            FROM events
        ),
        words AS (
            SELECT user_id, day,
                   string_agg(s, '' ORDER BY event_id) AS sax_word
            FROM sym GROUP BY 1, 2
        )
        SELECT sax_word,
               CAST(count(*) AS BIGINT)                AS n_user_days,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM words
        GROUP BY sax_word
    """,
    description="SAX symbolic discretization: per-user rank-quartile symbols (ntile over exact micros), per-(user, day) words via ordered string_agg, word frequency table — the motif-mining preprocessor",
    tags=("timeseries", "window", "text"),
)
def q_ts_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbolic Aggregate approXimation: discretize each user's value
    series into a small alphabet and emit per-(user, day) words, then
    the corpus-wide word frequency table — the preprocessing step of
    motif/anomaly mining over sensor series (HOT SAX family).
    Classical SAX z-normalizes against Gaussian breakpoints; that is
    float mean/std, so this kernel uses the rank-equivalent ntile(4)
    over exact value micros instead — same symbol semantics
    (per-series quartile bands), fully integer-deterministic, and
    ntile's bucket-fill rule (first n%4 buckets one longer) is
    identical in Spark and DuckDB given the unique (v_micros,
    event_id) order.

    Scale shape: the ntile window partitions per user (high
    cardinality, bounded rows per user), the word build is one
    groupBy(user, day) whose ordered concatenation Spark expresses as
    array_sort(collect_list(struct(event_id, s))) — bounded by a
    user-day's events — and the final word histogram is a
    map-side-combined count. No Python."""
    w = Window.partitionBy("user_id").orderBy("v_micros", "event_id")
    sym = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.col("ts").cast("date").alias("day"),
            "event_id",
            F.floor(F.col("value") * 1e6 + F.lit(0.5))
            .cast("long")
            .alias("v_micros"),
        )
        .withColumn(
            "sym_bucket", F.ntile(SAX_ALPHABET).over(w)
        )
        .withColumn("s", F.expr("char(96 + sym_bucket)"))
    )
    words = sym.groupBy("user_id", "day").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(event_id, s))),"
            " x -> x.s), '')"
        ).alias("sax_word")
    )
    return words.groupBy("sax_word").agg(
        F.count(F.lit(1)).alias("n_user_days"),
        F.countDistinct("user_id").alias("n_users"),
    )


# Bot screen: the top-K most metronomic users by inter-event gap spread.
BOT_MIN_EVENTS = 10
BOT_TOP_K = 20


@query(
    "q_events_bot_screen",
    oracle=f"""
        WITH g AS (
            SELECT user_id, epoch_us(ts) AS us,
                   lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id
                       ORDER BY epoch_us(ts), event_id) AS pus
            FROM events
        ),
        s AS (
            SELECT user_id,
                   CAST(count(*) + 1 AS BIGINT)    AS n_events,
                   CAST(min(us - pus) AS BIGINT)   AS min_gap_us,
                   CAST(max(us - pus) AS BIGINT)   AS max_gap_us,
                   CAST(sum(us - pus) AS BIGINT)   AS span_us
            FROM g WHERE pus IS NOT NULL
            GROUP BY user_id
        )
        SELECT user_id, n_events, min_gap_us, max_gap_us,
               max_gap_us - min_gap_us AS spread_us,
               CAST(n_events * 3600000000 // span_us AS BIGINT)
                   AS events_per_hour
        FROM s
        WHERE n_events >= {BOT_MIN_EVENTS} AND span_us > 0
        ORDER BY spread_us, user_id
        LIMIT {BOT_TOP_K}
    """,
    description="Bot/automation screen: top-20 most metronomic users by inter-event gap spread (max-min, exact integer microseconds) with event-rate, the regular-cadence detector fleet telemetry runs first",
    tags=("timeseries", "events", "anomaly"),
)
def q_events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Automated traffic beats humans at REGULARITY, not volume: a
    scripted poller's inter-event gaps cluster around its timer while
    human gaps spread over orders of magnitude. The screen ranks users
    (>= 10 events) by gap spread (max-min, exact integer us) and
    reports cadence rate — the first-pass bot detector for clickstream
    and device fleets (complements q_events_anomaly_days' volume
    screen and q_events_inter_arrival's corpus histogram, which have
    no per-user regularity signal).

    Scale shape: the lag window partitions per user (high cardinality,
    bounded per-user rows); per-user gap stats are one map-side
    combinable aggregation; the final cut is a global TakeOrdered
    (top-20) — never a full sort. No Python."""
    g = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = (
        g.withColumn("pus", F.lag("us").over(w))
        .filter(F.col("pus").isNotNull())
        .select("user_id", (F.col("us") - F.col("pus")).alias("gap"))
    )
    s = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.min("gap").alias("min_gap_us"),
        F.max("gap").alias("max_gap_us"),
        F.sum("gap").alias("span_us"),
    )
    return (
        s.filter(
            (F.col("n_events") >= BOT_MIN_EVENTS) & (F.col("span_us") > 0)
        )
        .select(
            "user_id",
            "n_events",
            "min_gap_us",
            "max_gap_us",
            (F.col("max_gap_us") - F.col("min_gap_us")).alias("spread_us"),
            F.expr("n_events * 3600000000 div span_us").alias(
                "events_per_hour"
            ),
        )
        .orderBy("spread_us", "user_id")
        .limit(BOT_TOP_K)
    )


@query(
    "q_events_survival",
    oracle="""
        WITH mx AS (
            SELECT max(epoch_us(ts)) AS gmax_us FROM events
        ),
        s AS (
            SELECT user_id, min(epoch_us(ts)) AS su
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        conv AS (
            SELECT s.user_id, min(epoch_us(e.ts)) AS pu
            FROM s JOIN events e ON e.user_id = s.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s.su
            GROUP BY s.user_id
        ),
        subj AS (
            SELECT s.user_id,
                   CASE WHEN conv.pu IS NOT NULL THEN 1 ELSE 0 END AS ev,
                   CASE WHEN conv.pu IS NOT NULL
                        THEN (conv.pu - s.su) // 86400000000
                        ELSE (mx.gmax_us - s.su) // 86400000000
                   END AS t_day
            FROM s LEFT JOIN conv ON s.user_id = conv.user_id, mx
        ),
        day_tbl AS (
            SELECT t_day,
                   CAST(sum(ev) AS BIGINT)     AS n_events,
                   CAST(sum(1 - ev) AS BIGINT) AS n_censored
            FROM subj GROUP BY t_day
        ),
        risk AS (
            SELECT t_day, n_events, n_censored,
                   CAST((SELECT count(*) FROM subj) AS BIGINT)
                   - CAST(coalesce(sum(n_events + n_censored) OVER (
                         ORDER BY t_day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS n_risk
            FROM day_tbl
        )
        SELECT t_day, n_risk, n_events, n_censored,
               CAST(n_events * 1000000 // n_risk AS BIGINT) AS hazard_ppm
        FROM risk
    """,
    description="Kaplan-Meier-style survival table for signup->purchase: per-day at-risk counts, events, right-censoring at corpus end, exact hazard in ppm — the retention curve's rigorous form",
    tags=("timeseries", "funnel", "survival"),
)
def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The survival-analysis life table behind "how long until users
    convert": each signup is a subject, the first later purchase is
    the event, subjects without one are RIGHT-CENSORED at the corpus
    head — the statistically honest treatment q_ts_funnel's raw
    conversion rate ignores (users who signed up yesterday haven't
    had time to convert). Per whole-day time bucket: at-risk count
    (subjects observed >= t), events, censorings, and the exact
    discrete hazard d_t/n_t in ppm. The KM survival curve is the
    running product of (1 - hazard); the table keeps integer exactness
    by reporting the hazard itself (a float cumprod would be
    order-dependent).

    Scale shape: signup/purchase aggregation and the left join all
    co-partition on user_id; the life table then lives at day-bucket
    cardinality (~30 rows), where the one cumulative window is free.
    Corpus head broadcasts as a 1-row scalar. No Python."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    gmax = ev.agg(F.max("us").alias("gmax_us"))
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("su"))
    )
    conv = (
        s.join(
            ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("us").alias("pu")
            ),
            "user_id",
        )
        .filter(F.col("pu") > F.col("su"))
        .groupBy("user_id")
        .agg(F.min("pu").alias("pu"))
    )
    subj = (
        s.join(conv, "user_id", "left")
        .crossJoin(F.broadcast(gmax))
        .select(
            F.when(F.col("pu").isNotNull(), 1).otherwise(0).alias("ev"),
            F.when(
                F.col("pu").isNotNull(),
                F.expr("(pu - su) div 86400000000"),
            )
            .otherwise(F.expr("(gmax_us - su) div 86400000000"))
            .alias("t_day"),
        )
    )
    day_tbl = subj.groupBy("t_day").agg(
        F.sum("ev").alias("n_events"),
        F.sum(F.lit(1) - F.col("ev")).alias("n_censored"),
    )
    total = subj.agg(F.count(F.lit(1)).alias("n_subj"))
    w = (
        Window.partitionBy()
        .orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        day_tbl.crossJoin(F.broadcast(total))
        .withColumn(
            "n_risk",
            F.col("n_subj")
            - F.coalesce(
                F.sum(F.col("n_events") + F.col("n_censored")).over(w),
                F.lit(0),
            ),
        )
    )
    return risk.select(
        "t_day",
        "n_risk",
        "n_events",
        "n_censored",
        F.expr("n_events * 1000000 div n_risk").alias("hazard_ppm"),
    )


@query(
    "q_ts_rollup_cascade",
    oracle="""
        WITH minute_agg AS (
            SELECT event_type,
                   date_trunc('minute', ts) AS minute_ts,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                        AS BIGINT)          AS micros
            FROM events
            GROUP BY 1, 2
        )
        SELECT event_type,
               date_trunc('hour', minute_ts)      AS hour_ts,
               CAST(sum(n) AS BIGINT)             AS n_events,
               CAST(sum(micros) AS BIGINT)        AS sum_value_micros,
               CAST(count(*) AS BIGINT)           AS n_active_minutes
        FROM minute_agg
        GROUP BY 1, 2
    """,
    description="Hierarchical rollup cascade: hour-grain aggregates derived FROM the minute-grain pre-aggregate (associative reaggregation — coarser grains never re-scan raw), plus active-minute cardinality only the cascade can see",
    tags=("timeseries", "aggregate", "rollup"),
)
def q_ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation cascade (r13) — THE load-bearing pattern of
    every metrics store (m3/druid/timescale continuous aggregates): the
    minute grain is computed from raw ONCE, and every coarser grain
    (here: hour) re-aggregates the MINUTE table, never the raw events.
    Correct because count/sum are associative; the oracle builds the
    same two-level cascade so both engines prove the identity
    hour-from-minute == hour-from-raw. n_active_minutes (count of
    minute rows per hour) is the density statistic only the cascade
    exposes — raw-scan hour rollups must pay a distinct for it, the
    cascade gets it as count(*).

    Values fold as per-row floor(value*1e6+0.5) micros at the MINUTE
    tier and plain BIGINT sums above it — exact at every grain
    (q_agg_group contract).

    Scale shape: one shuffle on (type, minute) — bounded at
    types x minutes rows regardless of event volume — then the hour
    tier reshuffles only that pre-aggregate (thousands of rows at any
    SF); at 100 TB the minute table is the materialized continuous
    aggregate every downstream grain mounts, exactly this plan."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("minute", F.col("ts")).alias("minute_ts"),
        F.expr("cast(floor(value * 1000000 + 0.5) as bigint)").alias("vmic"),
    )
    minute_agg = ev.groupBy("event_type", "minute_ts").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vmic").alias("micros"),
    )
    return minute_agg.groupBy(
        "event_type",
        F.date_trunc("hour", F.col("minute_ts")).alias("hour_ts"),
    ).agg(
        F.sum("n").alias("n_events"),
        F.sum("micros").alias("sum_value_micros"),
        F.count(F.lit(1)).alias("n_active_minutes"),
    )


@query(
    "q_ts_week_over_week",
    oracle="""
        WITH weekly AS (
            SELECT o_orderpriority,
                   CAST(date_trunc('week', CAST(o_orderdate AS DATE))
                        AS DATE)            AS week_start,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        AS BIGINT)          AS revenue_cents
            FROM orders
            GROUP BY 1, 2
        )
        SELECT o_orderpriority, week_start, n_orders, revenue_cents,
               CAST((revenue_cents - lag(revenue_cents) OVER w) * 1000000
                    // lag(revenue_cents) OVER w AS BIGINT) AS wow_ppm
        FROM weekly
        WINDOW w AS (PARTITION BY o_orderpriority ORDER BY week_start)
    """,
    description="Calendar-aligned week-over-week growth per priority: Monday-start weekly revenue cents + lag-based WoW delta in exact integer ppm (NULL first week)",
    tags=("timeseries", "window", "aggregate"),
)
def q_ts_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth (r13) — the dashboard metric every revenue
    review opens with, pinned calendar-aligned: date_trunc('week') is
    Monday-start in BOTH engines (probed, same dates), so weeks cannot
    drift by locale. Revenue folds to BIGINT cents per week; the WoW
    delta is (cur - prev) * 1e6 div prev in pure integers — and the
    div-by-negative case is safe because integral division TRUNCATES
    TOWARD ZERO in both engines (probed: -7 div 2 = -3 = -7 // 2).
    First week per priority is NULL (no prior), which lag gives for
    free.

    Scale shape: one combinable groupBy on (priority, week) — bounded
    at priorities x weeks rows — then a lag window PARTITIONED by
    priority over that small aggregate; never a whole-table window."""
    weekly = (
        load(spark, sf_dir, "orders")
        .groupBy(
            "o_orderpriority",
            F.date_trunc("week", F.col("o_orderdate"))
            .cast("date")
            .alias("week_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)")
            ).alias("revenue_cents"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("week_start")
    return (
        weekly.withColumn("_prev", F.lag("revenue_cents").over(w))
        .select(
            "o_orderpriority",
            "week_start",
            "n_orders",
            "revenue_cents",
            # integer div end to end (never a double /): truncation
            # toward zero matches DuckDB // exactly at any magnitude
            F.expr("(revenue_cents - _prev) * 1000000 div _prev").alias(
                "wow_ppm"
            ),
        )
    )


POWER_USER_PCT = 1  # the "top 1%" cohort


@query(
    "q_events_power_users",
    oracle=f"""
        WITH counts AS (
            SELECT user_id, CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY user_id
        ),
        ranked AS (
            SELECT n,
                   row_number() OVER (ORDER BY n DESC, user_id) AS rk,
                   (SELECT count(*) FROM counts) AS n_users
            FROM counts
        ),
        k AS (SELECT n_users, n_users * {POWER_USER_PCT} // 100 + 1 AS k
              FROM ranked LIMIT 1)
        SELECT CAST((SELECT n_users FROM k) AS BIGINT)      AS n_users,
               CAST((SELECT k FROM k) AS BIGINT)            AS cohort_size,
               CAST(sum(CASE WHEN rk <= (SELECT k FROM k)
                             THEN n END) AS BIGINT)         AS cohort_events,
               CAST(sum(n) AS BIGINT)                       AS total_events,
               CAST(min(CASE WHEN rk <= (SELECT k FROM k)
                             THEN n END) AS BIGINT)         AS threshold_events,
               CAST(sum(CASE WHEN rk <= (SELECT k FROM k) THEN n END)
                    * 1000000 // sum(n) AS BIGINT)          AS share_ppm
        FROM ranked
    """,
    description=f"Power-user concentration: the top-{POWER_USER_PCT}% cohort by event count (deterministic (count desc, id) rank via the two-level chunked ranking — no single-partition sort), cohort share of total traffic in exact ppm",
    tags=("timeseries", "events", "window", "aggregate"),
)
def q_events_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration audit (r13): how much of all activity the
    top-1% most active users generate — the first abuse/engagement
    question after q_events_bot_screen's cadence screen (regularity
    finds bots; raw concentration finds both whales and scripted
    floods). Cohort = the first ceil(1% of users) in the TOTAL
    (count DESC, user_id) order, so ties cannot blur the cutoff on
    either engine; reported as one summary row with the exact-ppm
    traffic share and the cohort's minimum event count (the
    "you need this many events to be a whale" threshold).

    Scale shape: per-user counts are one combinable groupBy; the
    global rank rides operators/ranking.chunked_row_number with the
    low-cardinality-metric recipe ((-n, user-id range) chunks) — never
    a single-partition sort (the q_agg_pareto discipline); the 1-row
    user total broadcasts; the final fold is a 1-row aggregate."""
    from .ranking import chunked_row_number

    counts = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("neg_n", -F.col("n"))
    )
    ranked = chunked_row_number(
        counts,
        ["neg_n", "user_id"],
        [
            F.col("neg_n"),
            (F.floor(F.col("user_id") / 4096)).cast("long"),
        ],
        rank_name="rk",
    )
    totals = counts.agg(F.count(F.lit(1)).alias("n_users"))
    r = ranked.crossJoin(F.broadcast(totals)).withColumn(
        "k", F.expr(f"n_users * {POWER_USER_PCT} div 100 + 1")
    )
    in_cohort = F.col("rk") <= F.col("k")
    return r.agg(
        F.max("n_users").alias("n_users"),
        F.max("k").alias("cohort_size"),
        F.sum(F.when(in_cohort, F.col("n"))).alias("cohort_events"),
        F.sum("n").alias("total_events"),
        F.min(F.when(in_cohort, F.col("n"))).alias("threshold_events"),
    ).select(
        "n_users",
        "cohort_size",
        "cohort_events",
        "total_events",
        "threshold_events",
        F.expr("cohort_events * 1000000 div total_events").alias(
            "share_ppm"
        ),
    )
