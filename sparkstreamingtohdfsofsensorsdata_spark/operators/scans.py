"""Scan / source operators (SURVEY.md §2.1).

The parquet scan is the engine's bread and butter: Catalyst pushes
sargable predicates into row-group/page filters and prunes columns at
the reader, so at 100 TB a query touching 2 of 11 columns reads ~2/11
of the bytes. ``q_scan_csv_json`` covers the reference's line-parsing
duty (sensor records arrived as delimited/JSON lines) via ``from_json``
on a real JSON column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load


@query(
    "q_scan_parquet",
    oracle="SELECT * FROM lineitem",
    description="Full-width parquet table scan",
    tags=("scan",),
)
def q_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan, all columns — the no-pruning baseline the driver can
    diff bit-for-bit (l_shipdate is ms-precision, lossless in both
    engines)."""
    return load(spark, sf_dir, "lineitem")


PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


@query(
    "q_scan_csv_json",
    oracle="""
        SELECT event_id,
               event_type,
               CAST(props->>'k' AS INTEGER) AS prop_k
        FROM events
        WHERE CAST(props->>'k' AS INTEGER) >= 50
    """,
    description="JSON line parsing via from_json (sensor-record ingest path)",
    tags=("scan", "json"),
)
def q_scan_csv_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the events.props JSON payload with an explicit schema —
    the Structured-Streaming ingest idiom (schema declared, never
    inferred, so malformed records become nulls instead of failures)."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.withColumn("p", F.from_json(F.col("props"), PROPS_SCHEMA))
    return (
        parsed.select(
            "event_id",
            "event_type",
            F.col("p.k").alias("prop_k"),
        )
        .filter(F.col("prop_k") >= 50)
    )


@query(
    "q_sink_partitioned",
    oracle="""
        SELECT event_type,
               count(*)             AS n,
               round(sum(value), 6) AS value_sum
        FROM events
        WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-07'
        GROUP BY event_type
    """,
    description="Batch partitioned parquet sink + partition-pruned read-back",
    tags=("scan", "sink", "partitioning"),
)
def q_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The at-rest layout story: write events hive-partitioned by day,
    read back with a day filter, aggregate.

    The read-back plan must show PartitionFilters (directory-level
    pruning: only 3 of ~30 day directories are listed/scanned) — the
    layout that makes a 100 TB time-range query touch only its days.
    The date literals are static here, so pruning happens at planning
    time; a join against a date dimension would use DPP the same way.
    """
    from ..session import scratch_dir

    out = scratch_dir("part_sink_")
    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    # Sort within partitions by the partition column before the write so
    # each task writes at most a handful of day-files (avoids the
    # task-count x partition-count small-file explosion at scale;
    # the heavier alternative is repartition(day) — a full shuffle).
    ev.sortWithinPartitions("event_date").write.mode("overwrite").partitionBy(
        "event_date"
    ).parquet(out)

    back = spark.read.parquet(out)
    return (
        back.filter(
            F.col("event_date").between("2024-01-05", "2024-01-07")
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
