"""Python DataSource connector (sources/python_ds, SURVEY §2.1 r13).

Covers the three claims the registry key's docstring makes: partition
planning (slice fan-out on monolithic files, row-group splits when the
file has many), Arrow-batch content equality against the native
reader, and the deterministic streaming feed incl. the replay
(readBetweenOffsets) contract."""

import os
import time

import pyarrow.parquet as pq
import pytest

from sparkstreamingtohdfsofsensorsdata_spark.sources.python_ds import (
    PYDS_FANOUT,
    STREAM_ROWS_PER_BATCH,
    STREAM_SENSORS,
    SensorStreamReader,
    _sensor_rows,
    events_pyds,
    register_pyds,
    sensor_stream,
)

SF = "/root/testdata/sf0.001"


def test_pyds_slice_partitions_and_content(spark):
    """Monolithic-row-group fixture -> PYDS_FANOUT slice partitions,
    and the union of slices is exactly the native reader's content."""
    df = events_pyds(spark, SF)
    assert df.rdd.getNumPartitions() == PYDS_FANOUT
    native = spark.read.parquet(os.path.join(SF, "events.parquet")).select(
        "event_id", "user_id", "event_type", "value"
    )
    assert df.count() == native.count()
    assert df.exceptAll(native).count() == 0
    assert native.exceptAll(df).count() == 0


def test_pyds_row_group_partitions(spark, tmp_path):
    """Multi-row-group file -> one InputPartition per row group (the
    parquet-native split a 100 TB table would use)."""
    src = pq.read_table(os.path.join(SF, "events.parquet"))
    path = str(tmp_path / "rg.parquet")
    pq.write_table(src, path, row_group_size=250)
    n_groups = pq.ParquetFile(path).num_row_groups
    assert n_groups > 1
    register_pyds(spark)
    df = spark.read.format("events_pyds").option("path", path).load()
    assert df.rdd.getNumPartitions() == n_groups
    assert df.count() == src.num_rows


def test_pyds_stream_replay_is_deterministic():
    """readBetweenOffsets must reproduce the original rows exactly —
    the exactly-once replay contract. Pure-Python check."""
    r = SensorStreamReader()
    start = r.initialOffset()
    first, nxt = r.read(start)
    first = list(first)
    assert nxt == {"row": STREAM_ROWS_PER_BATCH}
    assert list(r.readBetweenOffsets(start, nxt)) == first
    # arithmetic determinism: spot-pin the generator
    assert _sensor_rows(0, 2) == [(0, 0, 20_000), (1, 1, 27_919)]
    assert all(0 <= s < STREAM_SENSORS for _, s, _ in first)
    assert all(20_000 <= t < 30_000 for _, _, t in first)


def test_pyds_stream_canary(spark):
    """The streaming read path end to end: micro-batches land in a
    memory sink with the deterministic values the generator promises.

    Bounded by construction (ADVICE r13): max_rows caps the source and
    Trigger.AvailableNow drains it to completion and stops — no
    busy-looping 0-interval trigger, no 60s poll window."""
    q = (
        sensor_stream(spark, max_rows=STREAM_ROWS_PER_BATCH)
        .writeStream.format("memory")
        .queryName("pyds_canary")
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream canary did not drain in 120s"
    finally:
        q.stop()
    n = spark.sql("SELECT count(*) c FROM pyds_canary").first().c
    assert n == STREAM_ROWS_PER_BATCH
    rows = spark.sql(
        "SELECT * FROM pyds_canary WHERE reading_id < 3 ORDER BY reading_id"
    ).collect()
    assert [(r.reading_id, r.sensor_id, r.temp_milli_c) for r in rows] == [
        (0, 0, 20_000),
        (1, 1, 27_919),
        (2, 2, 25_838),
    ]


def test_jsonl_sink_manifest_is_the_table(spark):
    """r15 writer contract: _MANIFEST.json names exactly the committed
    parts, and read-back loads ONLY those — an orphaned part (what a
    speculative/retried task leaves behind) sitting in the directory
    must be invisible, and no temp files may survive a successful
    commit."""
    import glob
    import json
    import os

    from sparkstreamingtohdfsofsensorsdata_spark.session import scratch_dir
    from sparkstreamingtohdfsofsensorsdata_spark.sources.python_ds import (
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = scratch_dir("pyds_sink_test_")
    df = spark.range(40).selectExpr("id AS k", "id * 3 AS v").repartition(4)
    df.write.format("jsonl_pyds").option("path", out).mode("append").save()

    manifest = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert sum(manifest.values()) == 40
    assert len(manifest) == 4  # one part per task
    # every committed part exists; no temps survived the commit
    for part in manifest:
        assert os.path.exists(os.path.join(out, part))
    assert not glob.glob(os.path.join(out, ".*.tmp"))

    # plant an orphan "part" (uncommitted task residue) — read-back
    # through the manifest must not see its rows
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as fh:
        fh.write('{"k": 999999, "v": 0}\n')
    parts = [os.path.join(out, p) for p in sorted(manifest)]
    back = spark.read.schema("k long, v long").json(parts)
    assert back.count() == 40
    assert back.filter("k = 999999").count() == 0
    # values round-trip exactly
    assert back.selectExpr("sum(v) s").first().s == sum(i * 3 for i in range(40))
