"""Streaming batch-equivalence + late-data + exactly-once tests
(SURVEY.md §5.3).

The replay rig splits events into time-ordered chunk files and streams
them with maxFilesPerTrigger=1, so operators execute across many
micro-batches with real state handoff — then results are compared to
the identical computation run in batch (prefix-consistency makes that a
sound oracle).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
    make_replay_dir,
    stream_source,
)
from sparkstreamingtohdfsofsensorsdata_spark.streaming import ops
from sparkstreamingtohdfsofsensorsdata_spark.streaming.runner import (
    add_event_date,
    run_to_memory,
    write_file_sink,
)
from sparkstreamingtohdfsofsensorsdata_spark.streaming.stateful import alert_fsm
from sparkstreamingtohdfsofsensorsdata_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def replay_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("replay"))
    return make_replay_dir(spark, SF_DIR, out, n_chunks=6)


def _chunked_stream(spark, replay_dir):
    return stream_source(spark, replay_dir, max_files_per_trigger=1)


def _write_chunk(df, dest: str):
    """Write df as a single flat parquet FILE (the stream source does
    not recurse into part-file subdirectories)."""
    import glob as _glob
    import shutil as _shutil

    tmp = dest + "_tmpdir"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    (part,) = _glob.glob(os.path.join(tmp, "part-*.parquet"))
    os.replace(part, dest)
    _shutil.rmtree(tmp)


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_equals_batch_across_microbatches(spark, replay_dir):
    streamed = run_to_memory(ops.tumbling_counts(_chunked_stream(spark, replay_dir)))
    batch = ops.tumbling_counts(load(spark, SF_DIR, "events"))
    cols = ["window_start", "event_type", "n", "value_sum"]
    assert _rows(streamed, *cols) == _rows(batch, *cols)


def test_session_equals_batch_across_microbatches(spark, replay_dir):
    streamed = run_to_memory(ops.session_aggregate(_chunked_stream(spark, replay_dir)))
    batch = ops.session_aggregate(load(spark, SF_DIR, "events"))
    cols = ["session_start", "user_id", "n_events", "session_value"]
    assert _rows(streamed, *cols) == _rows(batch, *cols)


def test_stateful_alerts_equal_single_batch(spark, replay_dir):
    """FSM state must survive micro-batch boundaries: chunked replay and
    one-shot replay must flag the same events."""
    chunked = run_to_memory(
        alert_fsm(_chunked_stream(spark, replay_dir)), output_mode="append"
    )
    oneshot = run_to_memory(
        alert_fsm(stream_source(spark, f"{SF_DIR}/events.parquet*", raw_ns=True)),
        output_mode="append",
    )
    assert _rows(chunked, "user_id", "event_id") == _rows(oneshot, "user_id", "event_id")
    assert chunked.count() > 0


def test_late_data_dropped_after_watermark(spark, tmp_path):
    """Append-mode windows close when the watermark passes; events
    arriving later than the delay are dropped, not double-counted."""
    ev = load(spark, SF_DIR, "events")
    recent = ev.filter(F.col("ts") >= F.lit("2024-01-20"))
    old = ev.filter(F.col("ts") < F.lit("2024-01-05"))
    src = tmp_path / "src"
    src.mkdir()
    _write_chunk(recent, str(src / "a_recent.parquet"))

    agg = (
        stream_source(spark, str(src))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "n")
    )
    import uuid

    name = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_before = spark.table(name).count()
        # late chunk: 15+ days older than the watermark by now
        _write_chunk(old, str(src / "b_old.parquet"))
        q.processAllAvailable()
        after = spark.table(name)
        n_after = after.count()
    finally:
        q.stop()

    assert old.count() > 0
    # no window from the late (pre-Jan-5) range may appear
    assert after.filter(F.col("window_start") < F.lit("2024-01-05")).count() == 0
    assert n_after == n_before


def _run_with_ckpt(spark, df, ckpt: str, name: str, output_mode: str = "complete"):
    """Run an availableNow pass against a DURABLE checkpoint and return
    the memory-sink table (fresh table per pass; state/offsets resume
    from the checkpoint)."""
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.runner import (
        _prepare_streaming_session,
    )

    prev_parts = _prepare_streaming_session(df)
    q = None
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "streaming pass did not finish"
        return spark.table(name)
    finally:
        # A timed-out/failed pass must not leak a live query: it keeps
        # the durable checkpoint locked (the SECOND pass in the restart
        # tests reuses it) and keeps mutating the memory sink for the
        # session's lifetime — the exact trap test_canary documents
        # (review r6). Restore the shuffle-partition override too, per
        # _prepare_streaming_session's contract.
        if q is not None and q.isActive:
            q.stop()
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def test_windowed_agg_restart_recovery(spark, tmp_path):
    """Kill-and-resume for STATEFUL aggregation: a second availableNow
    pass on the same checkpoint must recover window state, fold in the
    new chunk, and emit exactly the batch answer over all data."""
    ev = load(spark, SF_DIR, "events")
    first = ev.filter(F.col("ts") < F.lit("2024-01-15"))
    second = ev.filter(F.col("ts") >= F.lit("2024-01-15"))
    assert first.count() > 0 and second.count() > 0
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    cols = ["window_start", "event_type", "n", "value_sum"]

    _write_chunk(first, str(src / "c0.parquet"))
    t1 = _run_with_ckpt(
        spark, ops.tumbling_counts(stream_source(spark, str(src))), ckpt, "rr_agg_1"
    )
    assert _rows(t1, *cols) == _rows(ops.tumbling_counts(first), *cols)

    # "crash": the first query object is gone; only the checkpoint survives.
    _write_chunk(second, str(src / "c1.parquet"))
    t2 = _run_with_ckpt(
        spark, ops.tumbling_counts(stream_source(spark, str(src))), ckpt, "rr_agg_2"
    )
    # complete mode re-emits ALL windows: pre-restart windows must come
    # back from the recovered state store, not just the new chunk.
    assert _rows(t2, *cols) == _rows(ops.tumbling_counts(ev), *cols)


def test_stream_stream_join_restart_recovery(spark, tmp_path):
    """Kill-and-resume for stream-stream join state, through the file
    sink (the memory sink refuses append-mode checkpoint recovery):
    pairs whose two sides arrive on opposite sides of the restart can
    only be emitted if the buffered side survived the checkpoint, and
    the committed output must stay exactly-once."""
    ev = load(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        write_file_sink(
            ops.purchases_joined_views(stream_source(spark, str(src))), out, ckpt
        )

    _write_chunk(first, str(src / "c0.parquet"))
    run_once()
    r1 = set(_rows(spark.read.parquet(out), "p_id", "v_id"))

    # "crash": only checkpoint + committed files survive; resume.
    _write_chunk(second, str(src / "c1.parquet"))
    run_once()
    final = spark.read.parquet(out)
    rall = set(_rows(final, "p_id", "v_id"))

    batch = set(_rows(ops.purchases_joined_views(ev), "p_id", "v_id"))
    assert rall == batch
    assert final.count() == len(rall), "restart duplicated committed join rows"
    # the recovery proof: some post-restart pair is NOT derivable from
    # the second half alone — its other side was recovered state.
    second_only = set(_rows(ops.purchases_joined_views(second), "p_id", "v_id"))
    assert (rall - r1) - second_only


def test_update_mode_emits_changed_windows_only(spark, tmp_path):
    """Update mode: each micro-batch emits exactly the windows it
    changed; last emission per window equals the batch answer."""
    # Parity-split chunks so the SAME windows receive rows in several
    # micro-batches (time-ordered chunks rarely straddle a window edge,
    # which would make update mode degenerate to one emission per window).
    ev = load(spark, SF_DIR, "events")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        _write_chunk(ev.filter(F.col("event_id") % 3 == i), str(src / f"c{i}.parquet"))
    agg = ops.tumbling_counts(
        stream_source(spark, str(src), max_files_per_trigger=1)
    )
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.runner import (
        run_foreach_batch,
    )

    epochs: list[tuple[int, list]] = []
    run_foreach_batch(
        agg,
        lambda df, eid: epochs.append((eid, df.collect())),
        output_mode="update",
    )
    assert len([e for e, rows in epochs if rows]) > 1, "replay collapsed to one batch"
    latest: dict = {}
    total_emitted = 0
    for eid, rows in epochs:
        for r in rows:
            total_emitted += 1
            latest[(r.window_start, r.event_type)] = (r.n, r.value_sum)
    batch = {
        (r.window_start, r.event_type): (r.n, r.value_sum)
        for r in ops.tumbling_counts(load(spark, SF_DIR, "events")).collect()
    }
    assert latest == batch
    # re-emission happened (some window updated across batches), but
    # update mode did not re-emit the whole state every trigger the way
    # complete mode does.
    assert total_emitted > len(batch)
    assert total_emitted < len(batch) * len(epochs)


def test_session_window_drops_late_data(spark, tmp_path):
    """Session windows under a TIGHT watermark: events older than the
    advanced watermark must not create or reopen sessions."""
    ev = load(spark, SF_DIR, "events")
    recent = ev.filter(F.col("ts") >= F.lit("2024-01-20"))
    old = ev.filter(F.col("ts") < F.lit("2024-01-05"))
    assert old.count() > 0
    src = tmp_path / "src"
    src.mkdir()
    _write_chunk(recent, str(src / "a_recent.parquet"))

    sess = ops.session_aggregate(
        stream_source(spark, str(src)), watermark="10 minutes"
    )
    import uuid

    name = f"latesess_{uuid.uuid4().hex[:8]}"
    q = (
        sess.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        n_before = spark.table(name).count()
        _write_chunk(old, str(src / "b_old.parquet"))
        q.processAllAvailable()
        after = spark.table(name)
        n_after = after.count()
    finally:
        q.stop()
    assert after.filter(F.col("session_start") < F.lit("2024-01-05")).count() == 0
    assert n_after == n_before


def test_stream_stream_join_drops_late_side(spark, tmp_path):
    """Stream-stream join under a TIGHT watermark: view-side state is
    evicted once the watermark passes ts + the join bound, so views
    arriving 15+ days late must not produce new join rows.

    The body retries once on *pyspark* errors only: four state stores
    per partition make this the suite's most runtime-sensitive query,
    and it has flaked (~1 in 4 full-suite runs) on engine-side errors
    under load. Assertion failures — the semantic check — never retry.
    """
    ev = load(spark, SF_DIR, "events")
    recent = ev.filter(F.col("ts") >= F.lit("2024-01-20"))
    old_views = ev.filter(
        (F.col("ts") < F.lit("2024-01-05")) & (F.col("event_type") == "view")
    )
    assert old_views.count() > 0

    import uuid

    from pyspark.errors.exceptions.base import PySparkException
    from pyspark.errors.exceptions.captured import CapturedException

    def attempt(src) -> tuple[int, int]:
        src.mkdir()
        _write_chunk(recent, str(src / "a_recent.parquet"))
        joined = ops.purchases_joined_views(
            stream_source(spark, str(src)), watermark="10 minutes"
        )
        name = f"latejoin_{uuid.uuid4().hex[:8]}"
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            n_before = spark.table(name).count()
            _write_chunk(old_views, str(src / "b_oldviews.parquet"))
            q.processAllAvailable()
            n_after = spark.table(name).count()
        finally:
            q.stop()
        return n_before, n_after

    try:
        n_before, n_after = attempt(tmp_path / "src")
    except (PySparkException, CapturedException) as exc:
        print(f"stream-stream late-side attempt 1 infra error, retrying: {exc}")
        n_before, n_after = attempt(tmp_path / "src_retry")
    assert n_after == n_before


def test_file_sink_exactly_once_resume(spark, tmp_path):
    """Restarting the sink with the same checkpoint must not duplicate
    committed files; new chunks are appended exactly once."""
    src = tmp_path / "src"
    src.mkdir()
    ev = load(spark, SF_DIR, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    _write_chunk(first, str(src / "c0.parquet"))

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = add_event_date(stream_source(spark, str(src)))
        write_file_sink(stream, out, ckpt, partition_cols=("event_date",))

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    # restart with no new data: nothing re-emitted
    run_once()
    assert spark.read.parquet(out).count() == n1

    # add data, restart: appended exactly once
    _write_chunk(second, str(src / "c1.parquet"))
    run_once()
    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.select("event_id").distinct().count() == ev.count()
    # partitioned layout on disk
    assert any(p.startswith("event_date=") for p in os.listdir(out))


def test_tws_plan_constructs(spark):
    # transformWithStateInPandas needs protobuf at RUNTIME (absent
    # offline — see stateful.user_stats_tws docstring), but the plan
    # wiring must build: streaming flag set, output schema as declared.
    from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
        events_stream,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.stateful import (
        user_stats_tws,
    )

    df = user_stats_tws(events_stream(spark, "/root/testdata/sf0.001"))
    assert df.isStreaming
    assert df.schema.simpleString() == (
        "struct<user_id:bigint,n_events:bigint,max_value:double>"
    )


def test_tws_runtime_end_to_end(spark):
    # Runtime twin of test_tws_plan_constructs: executes the processor
    # (state reads/writes, per-key fold) instead of just building the
    # plan. The TWS state protocol imports protobuf at runtime, absent
    # from this offline sandbox — the skip arms the test automatically
    # wherever protobuf exists (any real Spark 4 deployment).
    pytest.importorskip(
        "google.protobuf", reason="TWS state protocol requires protobuf"
    )
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
        events_stream,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.runner import (
        run_to_memory,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.stateful import (
        user_stats_tws,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    sf = "/root/testdata/sf0.001"
    out = run_to_memory(user_stats_tws(events_stream(spark, sf)), "update")
    # Update mode emits one row per key per micro-batch; both stats are
    # monotone folds, so max() recovers each key's final emission.
    got = sorted(
        out.groupBy("user_id")
        .agg(F.max("n_events").alias("n"), F.max("max_value").alias("mx"))
        .collect()
    )
    want = sorted(
        load(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("value"), 6).alias("mx"),
        )
        .collect()
    )
    assert got == want


def test_session_window_exact_gap_merges(spark):
    # Oracle-boundary pin for q_ts_session_window / q_stream_session
    # (round-3 ADVICE flagged the `diff > 1800` oracle as a suspected
    # mismatch): Spark's session merge is END-INCLUSIVE — an event at
    # exactly last_ts + gap still MERGES into the running session, and
    # only gap + 1us splits. That is precisely the oracle's strict-`>`
    # boundary, so the shared oracle is correct on any data, not just
    # the us-unique fixture.
    import datetime

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 5, 12, 0, 0)
    gap = datetime.timedelta(seconds=1800)
    eps = datetime.timedelta(microseconds=1)
    rows = [(1, base), (1, base + gap), (2, base), (2, base + gap + eps)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r.user_id: r.n
        for r in df.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert out == {1: 1, 2: 2}  # exactly-gap merges; gap+1us splits


def test_sliding_window_boundary_expansion(spark):
    # The q_stream_sliding oracle hand-expands each event into EXACTLY
    # two 30-min-slide buckets: floor(t/1800)*1800 and that minus 1800.
    # Verify Spark's window(ts, 1h, 30m) agrees — including an instant
    # exactly ON a slide boundary, which must land in starts {t, t-1800}
    # (never t-3600: the window [t-3600, t) excludes t).
    import datetime

    from pyspark.sql import functions as F

    base = datetime.datetime(2024, 1, 5, 12, 0, 0)  # exact 30-min mark
    rows = [
        ("on_boundary", base),
        ("just_after", base + datetime.timedelta(microseconds=1)),
        ("just_before", base - datetime.timedelta(microseconds=1)),
        ("mid_bucket", base + datetime.timedelta(minutes=7)),
    ]
    df = spark.createDataFrame(rows, "tag string, ts timestamp")
    got = {
        r["tag"]: sorted(r["starts"])
        for r in df.groupBy("tag")
        .agg(
            F.sort_array(
                F.collect_list(F.window("ts", "1 hour", "30 minutes").start)
            ).alias("starts")
        )
        .collect()
    }
    # batch window() emits one row per containing window via the same
    # expansion streaming uses, so collect_list sees each window once
    half = datetime.timedelta(minutes=30)
    assert got["on_boundary"] == [base - half, base]
    assert got["just_after"] == [base - half, base]
    assert got["just_before"] == [base - 2 * half, base - half]
    assert got["mid_bucket"] == [base - half, base]


def test_observe_metrics_on_stream(spark, replay_dir):
    # df.observe(): per-micro-batch pipeline observability (row counts,
    # value sums) riding the query itself — no second pass over the
    # data, works identically on batch plans. The production consumer
    # is a StreamingQueryListener; here the final progress event is
    # asserted directly.
    from pyspark.sql import Observation

    stream = (
        stream_source(spark, replay_dir, max_files_per_trigger=3)
        .observe(
            "ingest_metrics",
            F.count(F.lit(1)).alias("rows"),
            F.sum("value").alias("value_total"),
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    import uuid

    name = f"obs_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(300)
        progresses = [p for p in q.recentProgress if p and p.get("observedMetrics")]
        assert progresses, "no observed metrics in any progress event"
        total_rows = sum(
            p["observedMetrics"]["ingest_metrics"]["rows"] for p in progresses
        )
        ev = load(spark, SF_DIR, "events")
        assert total_rows == ev.count()
    finally:
        q.stop()


def test_chained_windows_drop_late_rows_in_inner_tier(spark, tmp_path):
    """Chained window aggregation: a late row rejected by the INNER
    tier's watermark can never resurrect in the outer hourly rollup —
    the cascade drops it exactly once. Parity-split chunks make the
    watermark jump to the stream's max after chunk 0, so chunk 1 is
    (almost) entirely late under a tight 1h delay."""
    ev = load(spark, SF_DIR, "events")
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        _write_chunk(ev.filter(F.col("event_id") % 2 == i), str(src / f"c{i}.parquet"))
    result = run_to_memory(
        ops.chained_window_rollup(
            stream_source(spark, str(src), max_files_per_trigger=1),
            watermark="1 hour",
        ),
        output_mode="append",
    )
    got = {
        (r["window_start"], r["event_type"]): r["n"] for r in result.collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(got.values()) < sum(batch.values())  # late rows really dropped
    for k, n in got.items():
        assert n <= batch[k]  # never more than the true count


def test_kafka_roundtrip_env_gated(spark):
    """Deploy-provability smoke for the one §2.1 source untestable
    offline (VERDICT r8 item 5): with a broker at $KAFKA_BOOTSTRAP (and
    the spark-sql-kafka connector on the classpath, e.g. via
    spark.jars.packages in the deploy profile), round-trip 100 JSON
    events batch-write -> kafka_source readStream -> memory sink and
    assert row parity with the file-replay parse of the same payloads.
    Offline the test skips — the gate, not the test body, is the
    environment-specific part."""
    import os
    import uuid

    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("KAFKA_BOOTSTRAP not set (offline environment)")

    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
        _parse_json_events,
        kafka_source,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    topic = f"events_smoke_{uuid.uuid4().hex[:8]}"
    payloads = (
        load(spark, "/root/testdata/sf0.001", "events")
        .limit(100)
        .select(
            F.to_json(
                F.struct(
                    "event_id",
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
                    "user_id",
                    "event_type",
                    "value",
                    "props",
                )
            ).alias("value")
        )
    )
    (
        payloads.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    stream = kafka_source(spark, bootstrap, topic)
    name = f"kafka_smoke_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
        got = sorted(
            tuple(r) for r in spark.table(name).collect()
        )
        expected = sorted(
            tuple(r) for r in _parse_json_events(payloads).collect()
        )
        assert got == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
