"""Driver-facing streaming queries: each runs a genuinely streaming
plan (file-replay source -> stateful operators -> availableNow) to
completion and returns the materialized result.

Because the replay covers the whole fixture and watermarks are set to
retain everything, each result equals the identical batch computation
— so the windowed aggregations and joins carry full DuckDB oracles
(sessionization is expressed relationally via lag + gap + running sum),
a stronger check than the rows-only fallback.
"""

from __future__ import annotations

import uuid


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import SESSION_GAP_ORACLE
from ..registry import query
from ..session import scratch_dir
from ..sources import python_ds
from ..sources.factory import events_stream
from ..tables import load
from . import ops
from .runner import add_event_date, run_to_memory, write_file_sink
from .stateful import alert_fsm


@query(
    "q_stream_tumbling",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               count(*)             AS n,
               round(sum(value), 6) AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    description="Streaming tumbling-window agg (1h buckets) == batch equivalent",
    tags=("streaming", "window"),
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(ops.tumbling_counts(events_stream(spark, sf_dir)))


@query(
    "q_stream_sliding",
    oracle="""
        SELECT window_start, event_type,
               count(*)             AS n,
               CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 / count(*) AS value_avg
        FROM (
            SELECT epoch_ms(CAST(floor(epoch(ts)/1800)*1800*1000 AS BIGINT)) AS window_start,
                   event_type, value
            FROM events
            UNION ALL
            SELECT epoch_ms(CAST((floor(epoch(ts)/1800)*1800 - 1800)*1000 AS BIGINT)) AS window_start,
                   event_type, value
            FROM events
        ) expanded
        GROUP BY 1, 2
    """,
    description="Streaming sliding-window agg (1h window / 30m slide)",
    tags=("streaming", "window"),
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(ops.sliding_stats(events_stream(spark, sf_dir)))


@query(
    "q_stream_session",
    oracle=SESSION_GAP_ORACLE,
    description="Streaming session windows (30m gap) == relational sessionization",
    tags=("streaming", "session"),
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(ops.session_aggregate(events_stream(spark, sf_dir)))


@query(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    description="Streaming dedup: first-seen per key == batch DISTINCT on the keys",
    tags=("streaming", "dedup"),
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(
        ops.dedup_keys(events_stream(spark, sf_dir)), output_mode="append"
    )


@query(
    "q_stream_static_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, c.c_name, c.c_mktsegment
        FROM events e
        JOIN customer c ON e.user_id = c.c_custkey
    """,
    description="Stream-static enrichment join (per-batch broadcast of the dim)",
    tags=("streaming", "join"),
)
def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    dim = load(spark, sf_dir, "customer")
    return run_to_memory(
        ops.enrich_with_dim(events_stream(spark, sf_dir), dim), output_mode="append"
    )


@query(
    "q_stream_stream_join",
    oracle="""
        SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id AS p_user
        FROM events p
        JOIN events v
          ON v.user_id = p.user_id
         AND p.event_type = 'purchase'
         AND v.event_type = 'view'
         AND v.ts <= p.ts
         AND v.ts > p.ts - INTERVAL 10 MINUTE
    """,
    description="Stream-stream time-bounded join (purchases x prior views)",
    tags=("streaming", "join"),
)
def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(
        ops.purchases_joined_views(events_stream(spark, sf_dir)), output_mode="append"
    )


@query(
    "q_stream_stateful_alerts",
    oracle="""
        WITH w AS (
            SELECT user_id, event_id, value,
                   lag(value, 1) OVER win AS v1,
                   lag(value, 2) OVER win AS v2
            FROM events
            WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id, event_id
        FROM w
        WHERE value > 50 AND v1 > 50 AND v2 > 50
    """,
    description="applyInPandasWithState alert FSM (3 consecutive high readings)",
    tags=("streaming", "stateful"),
)
def q_stream_stateful_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_to_memory(alert_fsm(events_stream(spark, sf_dir)), output_mode="append")


@query(
    "q_stream_sink",
    # The sink round-trip IS batch-expressible: a clean exactly-once
    # replay of the full events table must land every row exactly once,
    # so the read-back per-date counts equal the relational counts over
    # the source — a DUPLICATED or DROPPED row under the sink's
    # exactly-once protocol now breaks the hash compare instead of
    # hiding behind a rows-only verdict (was oracle=None through r7).
    oracle="""
        SELECT CAST(ts AS DATE) AS event_date,
               count(*)         AS n
        FROM events
        GROUP BY 1
    """,
    description="Exactly-once partitioned parquet sink (the reference's HDFS sink) + read-back, count-parity vs source",
    tags=("streaming", "sink"),
)
def q_stream_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream -> date-partitioned checkpointed parquet -> batch read-back.
    Fresh sink/checkpoint dirs per call keep reruns exactly-once."""
    base = scratch_dir("stream_sink_")
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    stream = add_event_date(events_stream(spark, sf_dir))
    write_file_sink(stream, out, ckpt, partition_cols=("event_date",))
    back = spark.read.parquet(out)
    return back.groupBy("event_date").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_stream_corpus_ingest",
    oracle="""
        WITH quality AS (
            SELECT source,
                   md5(lower(trim(text)))                    AS h,
                   CAST(ceil(length(lower(trim(text))) / 4.0)
                        AS BIGINT)                           AS toks
            FROM documents
            WHERE length(text) BETWEEN 100 AND 20000
        )
        SELECT source,
               count(*)                       AS n_unique,
               CAST(sum(toks) AS BIGINT)      AS tokens_total
        FROM (SELECT DISTINCT source, h, toks FROM quality)
        GROUP BY source
    """,
    description="Streaming corpus ingest: quality gate + stateful exact-dedup on arrival, per-source funnel",
    tags=("streaming", "llm", "dedup"),
)
def q_stream_corpus_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-prep funnel run ON ARRIVAL instead of at rest: the
    document feed is quality-gated (stateless JVM expressions) and
    exact-deduped against ALL history (stateful dropDuplicates on
    (source, content-hash)) as it streams in — the shape a crawl
    pipeline runs so downstream training jobs only ever see clean,
    unique documents.

    The dedup key set is (source, hash), so the admitted set — and
    therefore the funnel — is order-independent: every per-row value
    that survives dedup (the token count) is derived from the SAME
    normalized text the hash is, so it is a pure function of the key
    and no arrival order can change the surviving triple. (Deriving
    toks from the RAW text would break this: two arrivals differing
    only in case/whitespace share a hash but not a raw length, and
    whichever arrived first would decide the count.) State is one hash per unique (source, doc); with a real
    unbounded feed you bound it with dropDuplicatesWithinWatermark (the
    q_stream_dedup pattern) once re-crawl windows make exact history
    unnecessary.

    The per-source funnel aggregation runs INSIDE the streaming plan
    (dedup -> groupBy, two chained stateful operators, complete mode),
    so the driver-side memory sink only ever materializes one row per
    source — never one row per document. At 100 TB the sink holds
    |sources| rows while the heavy state (dedup hashes, running agg)
    stays partitioned across executors' state stores."""
    from ..sources.factory import documents_stream

    docs = documents_stream(spark, sf_dir)
    admitted = (
        docs.filter(F.length("text").between(100, 20000))
        .select(
            "source",
            F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
            F.ceil(F.length(F.lower(F.trim(F.col("text")))) / 4.0).alias(
                "toks"
            ),
        )
        .dropDuplicates(["source", "h"])
    )
    funnel = admitted.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("toks").alias("tokens_total"),
    )
    return run_to_memory(funnel, output_mode="complete")


@query(
    "q_stream_foreach_upsert",
    oracle="""
        SELECT user_id,
               arg_max(value, event_id)        AS value,
               CAST(max(event_id) AS BIGINT)   AS event_id
        FROM events
        GROUP BY user_id
    """,
    description="foreachBatch streaming upsert: per-epoch merge into a snapshot-pointer table (idempotent commit protocol)",
    tags=("streaming", "sink", "merge"),
)
def q_stream_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical production sink pattern Spark leaves to the user:
    stream deltas MERGEd into a warehouse table via ``foreachBatch``,
    made exactly-once with a snapshot-pointer commit protocol (the
    minimal form of a lakehouse transaction log):

    - each epoch ATTEMPT writes a NEW immutable snapshot directory
      ``v<epoch_id>_<attempt-nonce>`` holding current-state =
      merge(previous snapshot, this batch's winners) — never the
      directory the previous snapshot is being read from, so a retry
      can never hit Spark's cannot-overwrite-a-path-being-read error;
    - a one-line pointer file is atomically replaced (os.replace) to
      publish it — readers resolve the pointer, so they only ever see
      a fully-committed snapshot;
    - the streaming checkpoint makes epoch ids durable: a crash after
      publish but before the offset commit re-delivers the SAME batch
      under the SAME epoch_id, and re-merging it into the
      already-merged snapshot is a no-op (max_by winners are
      unchanged) — the republished snapshot is value-identical, which
      is the idempotence exactly-once needs on a non-transactional
      store. Superseded ``v*`` directories are garbage, vacuumed by
      retention (here: the scratch dir's lifetime).

    The replay is chunked (maxFilesPerTrigger=1 over 4 chunks) so the
    merge genuinely runs across multiple epochs with state carried
    through the published snapshots, not inside one batch. Merge keys
    are user_id; the winner per key is the highest event_id seen — an
    SCD-1 "latest value" dimension. At 100 TB each epoch's merge is
    one key-partitioned join of snapshot x batch (both parquet), and
    the pointer swap is O(1) regardless of table size."""
    import os

    from ..sources.factory import make_replay_dir, stream_source

    base = scratch_dir("upsert_")
    replay = make_replay_dir(spark, sf_dir, os.path.join(base, "replay"), n_chunks=4)
    pointer = os.path.join(base, "CURRENT")

    def read_current(s: SparkSession) -> DataFrame | None:
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            path = fh.read().strip()
        return s.read.parquet(path)

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        best = batch_df.groupBy("user_id").agg(
            F.max_by("value", "event_id").alias("value"),
            F.max("event_id").alias("event_id"),
        )
        cur = read_current(s)
        if cur is not None:
            merged = (
                cur.unionByName(best)
                .groupBy("user_id")
                .agg(
                    F.max_by("value", "event_id").alias("value"),
                    F.max("event_id").alias("event_id"),
                )
            )
        else:
            merged = best
        # Attempt-unique target: epoch id for lineage, nonce so a retry
        # never writes into the directory `cur` is lazily reading.
        snap = os.path.join(base, f"v{epoch_id}_{uuid.uuid4().hex[:8]}")
        merged.write.mode("errorifexists").parquet(snap)
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(snap)
        os.replace(tmp, pointer)

    from .runner import run_foreach_batch

    deltas = stream_source(spark, replay, max_files_per_trigger=1).select(
        "user_id", "event_id", "value"
    )
    run_foreach_batch(deltas, upsert, checkpoint=os.path.join(base, "ckpt"))
    final = read_current(spark)
    if final is None:
        raise RuntimeError("no snapshot was published by any epoch")
    return final.select("user_id", "value", "event_id")


@query(
    "q_stream_stream_left_join",
    oracle="""
        SELECT p.event_id AS p_id, v.event_id AS v_id, p.user_id AS p_user
        FROM events p
        LEFT JOIN events v
          ON v.user_id = p.user_id
         AND v.event_type = 'view'
         AND v.ts <= p.ts
         AND v.ts > p.ts - INTERVAL 10 MINUTE
        WHERE p.event_type = 'purchase'
    """,
    description="Stream-stream LEFT OUTER join: watermark-driven null emission for unmatched purchases",
    tags=("streaming", "join"),
)
def q_stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The outer-join twin of q_stream_stream_join, exercising the one
    behavior the inner join never touches: null-extended rows exist
    ONLY because the watermark advanced past a purchase's match
    horizon. Two rig consequences, both the production shape:

    - the replay must be CHUNKED (ts-ordered micro-batches) so the
      watermark genuinely advances between batches rather than jumping
      once at end-of-input;
    - a final flush chunk carries one sentinel row per side (user_id
      -1, ts = max + 1 year) to push the watermark past every real
      purchase — the availableNow no-data finalization batch then
      emits the remaining null-extended rows. A live deployment gets
      this for free from the next day's traffic; a bounded replay has
      to say "input is over" in event time, exactly like Kafka
      topologies inject heartbeat messages into quiet partitions.
      Sentinels join to nothing (negative user) and are dropped inside
      the op before the sink."""
    from ..sources.factory import memo_replay_dir, stream_source

    replay = memo_replay_dir(spark, sf_dir, n_chunks=2, tag="sslj")
    # ONE flush chunk: its sentinels advance max event time, and
    # availableNow then runs a trailing NO-DATA batch whose watermark
    # (+1 year - delay) evicts and null-emits the tail purchases.
    # Every micro-batch of a stream-stream join pays a fixed state
    # commit cost across both sides' stores, so the replay is kept to
    # 2 data chunks + flush — enough for the watermark to advance
    # between real batches (chunk 1's unmatched purchases emit during
    # chunk 2), cheap enough for the bench. One sentinel per side so
    # BOTH input watermarks advance (min-policy).
    _flush_chunk(
        spark,
        sf_dir,
        replay,
        lambda flush_ts: [
            (-1, flush_ts, -1, "purchase", 0.0, ""),
            (-2, flush_ts, -1, "view", 0.0, ""),
        ],
    )
    stream = stream_source(spark, replay, max_files_per_trigger=1)
    result = run_to_memory(
        ops.purchases_left_joined_views(stream), output_mode="append"
    )
    # Sentinels are dropped HERE, on the materialized batch result — an
    # in-stream filter on left-side columns would be pushed below the
    # watermark node and stall it (see purchases_left_joined_views).
    return result.filter(F.col("p_user") >= 0)


@query(
    "q_stream_update_mode",
    oracle="""
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
               event_type,
               count(*)               AS n,
               round(sum(value), 6)   AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    description="Update-output-mode streaming agg: changelog captured per epoch, last-write state equals batch",
    tags=("streaming", "agg", "update"),
)
def q_stream_update_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third output mode, untouched by the other streaming keys
    (complete re-emits everything; append emits once below watermark):
    UPDATE emits only the groups a micro-batch changed. The rig
    captures every epoch's changelog through foreachBatch and folds it
    last-write-wins per group — the exact reconstruction a downstream
    keyed store (Redis/HBase) performs — and that folded state must
    equal the batch aggregation. The chunked replay makes epochs
    overlap groups (a day's window spans chunk boundaries), so the
    fold genuinely exercises supersession, not just union. Changelogs
    are aggregated rows (group cardinality, not input rows) — the
    driver-side capture is control-plane-sized by construction.

    Sink shape (VERDICT r11 + r15): the foreachBatch hook reuses the
    q_stream_foreach_upsert pattern — each epoch's changelog is
    written EXECUTOR-SIDE to an immutable per-epoch parquet directory
    (batch_df.write, the keyed-store UPSERT stand-in), and the
    last-write-wins fold is itself a DataFrame aggregation over the
    epoch log (``max_by(·, epoch_id)`` per group). Nothing
    row-scaled ever reaches the driver: the only driver-side state is
    the list of epoch ids (control plane, one entry per micro-batch),
    used to assert the replay really produced >= 3 epochs."""
    import os

    from ..sources.factory import memo_replay_dir, stream_source
    from .runner import run_foreach_batch

    replay = memo_replay_dir(spark, sf_dir, n_chunks=3, tag="upd")
    stream = stream_source(spark, replay, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", ops.RETAIN_ALL_WATERMARK)
        .groupBy(F.date_trunc("day", F.col("ts")).alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
    base = scratch_dir("upd_log_")
    epochs: list = []

    def capture(batch_df: DataFrame, epoch_id: int) -> None:
        epochs.append(epoch_id)
        # Executor-side changelog append: one immutable dir per epoch
        # (the q_stream_foreach_upsert snapshot discipline; epoch_id
        # rides along as the supersession version for the fold below).
        batch_df.withColumn("epoch_id", F.lit(epoch_id)).write.parquet(
            os.path.join(base, f"e{epoch_id:06d}")
        )

    run_foreach_batch(agg, capture, output_mode="update")
    if len(epochs) < 3:
        raise AssertionError(
            f"update-mode replay collapsed to {len(epochs)} epochs — "
            "the supersession fold was not exercised"
        )
    # Last-write-wins per group across the epoch log — the exact
    # reconstruction a downstream keyed store performs, spelled as a
    # grouped max_by on the epoch version (distributed; group
    # cardinality output, no driver fold).
    log = spark.read.parquet(*[os.path.join(base, f"e{e:06d}") for e in epochs])
    return log.groupBy("window_start", "event_type").agg(
        F.max_by("n", "epoch_id").alias("n"),
        F.max_by("value_sum", "epoch_id").alias("value_sum"),
    )


def _flush_chunk(
    spark: SparkSession, sf_dir: str, replay: str, rows_fn
) -> None:
    """Append a chunk_999 flush file (sentinel rows that advance event
    time past all real data) to a memoized replay layout, once."""
    import datetime
    import glob as _glob
    import os

    from ..sources.factory import EVENTS_TS_SCHEMA

    flush = os.path.join(replay, "chunk_999.parquet")
    if os.path.exists(flush):
        return
    max_ts = load(spark, sf_dir, "events").agg(F.max("ts")).collect()[0][0]
    flush_ts = max_ts + datetime.timedelta(days=365)
    tmp = os.path.join(os.path.dirname(replay), "_flush_tmp")
    (
        spark.createDataFrame(rows_fn(flush_ts), EVENTS_TS_SCHEMA)
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.replace(part, flush)


@query(
    "q_stream_chained_windows",
    oracle="""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
               event_type,
               CAST(count(*) AS BIGINT) AS n,
               round(sum(value), 6)     AS value_sum
        FROM events
        GROUP BY 1, 2
    """,
    description="Chained streaming window aggregation: 30-min partials re-aggregated hourly in ONE query",
    tags=("streaming", "window", "chained"),
)
def q_stream_chained_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two stateful window aggregations chained inside one streaming
    query (Spark >= 3.5 multiple-stateful-operator support): 30-minute
    partial aggregates re-aggregated to the hourly grain via
    ``window_time``, emitted in APPEND mode as each hour finalizes.
    The batch equivalence that makes this oracle-checkable: summing
    30-min partials into hours equals aggregating the raw stream
    hourly, because count/sum are algebraic — the same property that
    justifies map-side combine justifies the streaming cascade.

    Rig notes: append mode emits nothing until the watermark passes a
    window's end, so the replay is chunked (watermark advances between
    micro-batches) and a flush sentinel (event_type '_flush', ts = max
    + 1 year) pushes event time past all real windows; the availableNow
    trailing no-data batch then finalizes and emits them. The
    sentinel's own (still-open) window is dropped post-materialization
    — an in-stream filter could be pushed below the watermark node and
    stall it (the q_stream_stream_left_join trap).

    Scale shape: inner state is (30-min window x type) keyed, evicted
    at watermark + 1 h; outer state sees one partial row per closed
    inner window, so the second tier's input scales with window
    cardinality, not event volume — the streaming analogue of
    q_agg_skew_salted's two-phase reduce.
    """
    from ..sources.factory import memo_replay_dir, stream_source

    replay = memo_replay_dir(spark, sf_dir, n_chunks=2, tag="chw")
    _flush_chunk(
        spark,
        sf_dir,
        replay,
        lambda flush_ts: [(-1, flush_ts, -1, "_flush", 0.0, "")],
    )
    stream = stream_source(spark, replay, max_files_per_trigger=1)
    result = run_to_memory(
        ops.chained_window_rollup(stream), output_mode="append"
    )
    return result.filter(F.col("event_type") != "_flush")


@query(
    "q_stream_cdc_apply",
    oracle="""
        WITH tagged AS (
            SELECT user_id, event_id,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_cents,
                   CASE event_type WHEN 'signup' THEN 'I'
                                   WHEN 'error'  THEN 'D'
                                   ELSE 'U' END             AS op
            FROM events
        ),
        latest AS (
            SELECT user_id,
                   arg_max(op, event_id)          AS last_op,
                   arg_max(value_cents, event_id) AS value_cents,
                   max(event_id)                  AS last_event
            FROM tagged GROUP BY user_id
        )
        SELECT user_id,
               CAST(value_cents AS BIGINT) AS value_cents,
               CAST(last_event AS BIGINT)  AS last_event
        FROM latest WHERE last_op <> 'D'
    """,
    description="Streaming CDC apply (I/U/D change stream into a snapshot table via foreachBatch, tombstones retained for sequence correctness)",
    tags=("streaming", "sink", "merge", "cdc"),
)
def q_stream_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY CHANGES — the lakehouse ingestion op (Debezium topic →
    warehouse table): a change stream of keyed Insert/Update/Delete
    ops (derived deterministically from the event stream: signup=I,
    error=D, everything else=U) applied to a snapshot table through
    ``foreachBatch``, with the same snapshot-pointer exactly-once
    commit protocol as q_stream_foreach_upsert. Semantics are
    sequence_by(event_id) latest-op-wins: a key is live iff its
    highest-sequence op is not a delete — the DLT APPLY CHANGES
    contract.

    The part everyone gets wrong is in the snapshot schema: DELETES
    ARE RETAINED AS TOMBSTONES (op column kept, filtered only at read
    time). Dropping a deleted key from the snapshot loses its sequence
    number, so a straggler update with a LOWER sequence arriving in a
    later micro-batch would silently resurrect the key; merging
    against the tombstone's sequence correctly discards it. Tombstone
    retention/vacuum is a RETENTION policy (how long can stragglers
    arrive?), not a merge-time optimization.

    Each epoch: batch reduced to its per-key latest op (map-side
    max_by), one key-partitioned merge against the snapshot, O(1)
    pointer publish; idempotent under epoch replay exactly as
    documented in q_stream_foreach_upsert. At 100 TB both sides
    bucket by the merge key."""
    import os

    from ..sources.factory import make_replay_dir, stream_source

    base = scratch_dir("cdc_")
    replay = make_replay_dir(spark, sf_dir, os.path.join(base, "replay"), n_chunks=4)
    pointer = os.path.join(base, "CURRENT")

    def read_current(s: SparkSession) -> DataFrame | None:
        if not os.path.exists(pointer):
            return None
        with open(pointer) as fh:
            path = fh.read().strip()
        return s.read.parquet(path)

    def apply_changes(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        tagged = batch_df.select(
            "user_id",
            "event_id",
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("value_cents"),
            F.when(F.col("event_type") == "signup", "I")
            .when(F.col("event_type") == "error", "D")
            .otherwise("U")
            .alias("op"),
        )
        best = tagged.groupBy("user_id").agg(
            F.max_by("op", "event_id").alias("op"),
            F.max_by("value_cents", "event_id").alias("value_cents"),
            F.max("event_id").alias("event_id"),
        )
        cur = read_current(s)
        if cur is not None:
            # tombstones included on BOTH sides: the merge compares
            # sequence numbers against deletes too
            merged = (
                cur.unionByName(best)
                .groupBy("user_id")
                .agg(
                    F.max_by("op", "event_id").alias("op"),
                    F.max_by("value_cents", "event_id").alias("value_cents"),
                    F.max("event_id").alias("event_id"),
                )
            )
        else:
            merged = best
        snap = os.path.join(base, f"v{epoch_id}_{uuid.uuid4().hex[:8]}")
        merged.write.mode("errorifexists").parquet(snap)
        tmp = pointer + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(snap)
        os.replace(tmp, pointer)

    from .runner import run_foreach_batch

    deltas = stream_source(spark, replay, max_files_per_trigger=1).select(
        "user_id", "event_id", "value", "event_type"
    )
    run_foreach_batch(deltas, apply_changes, checkpoint=os.path.join(base, "ckpt"))
    final = read_current(spark)
    if final is None:
        raise RuntimeError("no snapshot was published by any epoch")
    # read-time tombstone filter: deleted keys exist in the snapshot,
    # never in the served table
    return (
        final.filter(F.col("op") != "D")
        .select(
            "user_id",
            "value_cents",
            F.col("event_id").alias("last_event"),
        )
    )


@query(
    "q_stream_python_ds",
    oracle=f"""
        SELECT CAST(i % {python_ds.STREAM_SENSORS} AS BIGINT) AS sensor_id,
               CAST(count(*) AS BIGINT)                       AS n_readings,
               CAST(sum(20000 + (i * 7919) % 10000) AS BIGINT)
                                                              AS sum_temp_milli,
               CAST(sum(20000 + (i * 7919) % 10000)
                    // count(*) AS BIGINT)                    AS mean_temp_milli,
               CAST(max(i) AS BIGINT)                         AS last_reading
        FROM range(0, {python_ds.STREAM_ROWS_PER_BATCH}) t(i)
        GROUP BY 1
    """,
    description="Custom Python streaming source end to end (r13): the registered sensor DataSource read via readStream + availableNow, per-sensor aggregate in a memory sink; oracle regenerates the deterministic feed arithmetically",
    tags=("streaming", "source", "python-ds"),
)
def q_stream_python_ds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full third-party STREAMING connector path (r13, §2.1/§2.9):
    sources/python_ds.SensorStreamReader — a pure-Python
    SimpleDataSourceStreamReader whose offset is a row counter —
    mounted with readStream, bounded two ways (the availableNow
    barrier AND the reader's max_rows cap, so the processed range is
    deterministic by construction under ANY prefetch policy), and
    folded to a per-sensor aggregate in complete mode. The oracle
    REGENERATES the same rows arithmetically from range() — possible
    only because the feed derives every field from the offset, which
    is exactly the replay discipline (readBetweenOffsets) a real
    source needs for exactly-once.

    sf_dir is unused (the source is synthetic) — the signature is the
    registry contract.

    Scale shape: the micro-batch is one narrow scan + map-side
    combined agg on a 25-value key; a production deployment swaps the
    generator for a partition-parallel reader (Kafka-like) and keeps
    the identical downstream plan."""
    del sf_dir
    from ..sources.python_ds import STREAM_ROWS_PER_BATCH, sensor_stream

    readings = sensor_stream(spark, max_rows=STREAM_ROWS_PER_BATCH)
    agg = readings.groupBy("sensor_id").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.sum("temp_milli_c").alias("sum_temp_milli"),
        F.expr("sum(temp_milli_c) div count(1)").alias("mean_temp_milli"),
        F.max("reading_id").alias("last_reading"),
    )
    return run_to_memory(agg)
