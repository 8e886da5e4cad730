"""Timestamp canary (VERDICT r2 item 2): every read path of
``events.ts`` must deliver 2024-range microsecond instants as a plain
TimestampType column.

Why this exists: the fixture stores ``ts`` as TIMESTAMP(NANOS) parquet,
and how Spark surfaces that has changed across releases (raw ns longs
under the legacy conf vs native TIMESTAMP_NTZ truncation under 4.1+).
Between rounds 1 and 2 a runtime bump silently collapsed every
streaming event onto ~1970-01-20 — watermarks, windows, and joins all
kept "working" on garbage time. These tests make that failure mode a
loud red X instead.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from sparkstreamingtohdfsofsensorsdata_spark.session import scratch_dir
from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
    events_stream,
    make_replay_dir,
    stream_source,
)
from sparkstreamingtohdfsofsensorsdata_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _assert_2024_range(rows):
    (row,) = rows
    assert row["y_min"] == 2024 and row["y_max"] == 2024, (
        f"events.ts collapsed out of the fixture's 2024 range: {row} — "
        "a runtime bump likely changed how TIMESTAMP(NANOS) parquet is "
        "read (see tables._normalize_ts)"
    )


def _year_bounds(df):
    return df.agg(
        F.year(F.min("ts")).alias("y_min"), F.year(F.max("ts")).alias("y_max")
    )


def _run_stream_bounds(stream):
    # run_to_memory raises on timeout and stops the query — rolling a
    # bare start()/awaitTermination here once let a timed-out canary
    # assert against a partial memory table (and leak the query).
    from sparkstreamingtohdfsofsensorsdata_spark.streaming.runner import (
        run_to_memory,
    )

    return run_to_memory(
        _year_bounds(stream.groupBy()), output_mode="complete"
    ).collect()


def test_batch_load_ts_is_2024_us_timestamp(spark):
    ev = load(spark, SF_DIR, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)
    _assert_2024_range(_year_bounds(ev).collect())
    # us-instant sanity: epoch micros of 2024-01-01 is ~1.704e15
    (mn,) = ev.agg(F.min(F.unix_micros("ts")).alias("m")).collect()
    assert 1_700_000_000_000_000 < mn["m"] < 1_800_000_000_000_000


def test_events_stream_ts_is_2024(spark):
    stream = events_stream(spark, SF_DIR)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    _assert_2024_range(_run_stream_bounds(stream))


@pytest.fixture(scope="module")
def replay_dir(spark):
    out = scratch_dir("canary_replay_")
    yield make_replay_dir(spark, SF_DIR, out, n_chunks=4)
    shutil.rmtree(out, ignore_errors=True)


def test_replay_chunk_stream_ts_is_2024(spark, replay_dir):
    stream = stream_source(spark, replay_dir, max_files_per_trigger=1)
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
    _assert_2024_range(_run_stream_bounds(stream))


def test_rate_source_produces_canonical_events(spark):
    # The rate source must emit the same schema as every other events
    # source (the whole point of the factory), and actually produce
    # rows offline — it is the one non-file streaming source that can
    # be exercised without external infrastructure.
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.sources.factory import (
        EVENTS_TS_SCHEMA,
        rate_source,
    )

    stream = rate_source(spark, rows_per_second=500, num_partitions=2)
    assert [f.name for f in stream.schema.fields] == [
        f.name for f in EVENTS_TS_SCHEMA.fields
    ]
    q = (
        stream.writeStream.format("memory")
        .queryName("canary_rate")
        .outputMode("append")
        .start()
    )
    try:
        import time

        # Plain polling, NOT processAllAvailable: a rate source
        # generates forever, so "all available" can chase its tail.
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("canary_rate").count() > 0:
                break
            time.sleep(0.5)
    finally:
        # Stop BEFORE asserting: content checks against a live memory
        # table race the stream (two separate .count() actions can see
        # different row sets as micro-batches land between them).
        q.stop()
    out = spark.table("canary_rate")
    assert out.count() > 0
    types = {r[0] for r in out.select("event_type").distinct().collect()}
    assert types <= {"click", "purchase", "error", "signup", "view"}
    assert out.filter(F.col("props").rlike('^\\{"k":\\d+\\}$')).count() == out.count()


def test_text_line_null_round_trip(spark):
    # Null fields must keep their slot through the pipe-delimited
    # format (concat_ws silently drops bare NULLs, shifting later
    # fields left) and come back as real NULLs, not sentinel strings.
    import datetime

    from sparkstreamingtohdfsofsensorsdata_spark.operators.scans import (
        parse_event_lines,
        serialize_event_lines,
    )

    ts = datetime.datetime(2024, 1, 5, 12, 0, 1)
    ev = spark.createDataFrame(
        [
            (1, ts, 7, "click", 1.5, "k=v"),
            (2, ts, None, None, None, None),  # nulls mid-record
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    back = {
        r.event_id: r
        for r in parse_event_lines(serialize_event_lines(ev)).collect()
    }
    assert back[1].user_id == 7 and back[1].props == "k=v"
    r2 = back[2]
    assert r2.user_id is None and r2.event_type is None
    assert r2.value is None and r2.props is None
    assert r2.ts == ts  # later fields did NOT shift into null slots


def test_text_line_malformed_raises(spark):
    # A stray delimiter inside a field must fail the scan loudly
    # (size != 6 guard), never silently misalign the parse.
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sparkstreamingtohdfsofsensorsdata_spark.operators.scans import (
        parse_event_lines,
    )

    bad = spark.createDataFrame(
        [("1|2024-01-05 12:00:01|7|click|1.5|k=v|extra",)], "value string"
    )
    with pytest.raises(SparkRuntimeException, match="malformed text line"):
        parse_event_lines(bad).collect()


def test_text_line_guard_survives_column_pruning(spark):
    # Every parsed column carries the guard, because a guard riding a
    # single column is column-pruned away by any plan that drops it —
    # the q_scan_text_lines aggregate never reads event_id, and a
    # one-column guard let malformed lines aggregate SILENTLY (caught
    # by round-4 self-review, verified against the executed plan).
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.operators.scans import (
        parse_event_lines,
    )

    bad = spark.createDataFrame(
        [("1|2024-01-05 12:00:01|7|click|1.5|k=v|extra",)], "value string"
    )
    narrow = parse_event_lines(bad).groupBy("event_type").agg(
        F.round(F.sum("value"), 6).alias("value_sum")
    )
    with pytest.raises(SparkRuntimeException, match="malformed text line"):
        narrow.collect()


def test_text_line_unserializable_field_raises_at_write(spark):
    # The delimiter-free format cannot carry '|' or a literal sentinel
    # inside a free-text field; serialization must refuse loudly, not
    # emit a line that parses into different data.
    import datetime

    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from sparkstreamingtohdfsofsensorsdata_spark.operators.scans import (
        serialize_event_lines,
    )

    ts = datetime.datetime(2024, 1, 5, 12, 0, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    pipey = spark.createDataFrame([(1, ts, 7, "click", 1.0, "a|b")], schema)
    with pytest.raises(SparkRuntimeException, match="unserializable props"):
        serialize_event_lines(pipey).collect()
    sentinelly = spark.createDataFrame(
        [(1, ts, 7, "\\N", 1.0, "k=v")], schema
    )
    with pytest.raises(SparkRuntimeException, match="unserializable event_type"):
        serialize_event_lines(sentinelly).collect()
