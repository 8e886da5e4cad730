"""Driver contract for the spark-graft builder (PySpark target).

Thin views over the engine's central query registry
(``sparkstreamingtohdfsofsensorsdata_spark.registry``): every operator module
registers a (name, spark_fn, oracle_sql) triple there, so this file
never needs editing as coverage grows.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from sparkstreamingtohdfsofsensorsdata_spark import registry
from sparkstreamingtohdfsofsensorsdata_spark.tables import SMOKE_SF_DIR


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on sf0.001."""
    specs = registry.load_all()
    return specs["q_agg_group"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted keys -> rows-only check."""
    return registry.oracles()
