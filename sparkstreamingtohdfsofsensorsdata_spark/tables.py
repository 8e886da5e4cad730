"""Fixture-table access.

One parquet file per table at ``{sf_dir}/{name}.parquet`` (TESTDATA.md).
Loading goes through here so every operator reads with the same scan
settings and so a future cluster deployment can swap the path scheme
(e.g. HDFS, partitioned directories) in one place.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import expr, timestamp_micros
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SMOKE_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch-read one fixture table.

    Column pruning and predicate pushdown happen automatically because
    callers express projections/filters declaratively on the returned
    DataFrame (verify with ``.explain()`` -> ``PushedFilters``).

    ``events.ts`` is stored as TIMESTAMP(NANOS), which Spark's parquet
    reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it as a
    raw long via the legacy conf and rebuild a TimestampType column;
    the fixture's values are us-aligned so ns->us floor division is
    lossless and agrees exactly with the DuckDB oracle.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition iff the scan under-splits the available cores.

    CPU-heavy per-row expressions (md5 signatures, simhash folds) are
    only as parallel as their input partitioning, and a small parquet
    file arrives as ONE split regardless of cluster size. At real scale
    the source is thousands of splits and this is a no-op; when the
    input collapses below the session's parallelism, one narrow shuffle
    spreads the hash work across every core.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for the SQL entry point."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
