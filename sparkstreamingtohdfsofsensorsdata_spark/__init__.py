"""A PySpark-native analytics engine: streaming sensor-ETL heritage
(Structured Streaming -> partitioned parquet/HDFS sink) plus a full
relational batch surface and LLM-data-pipeline operators, all expressed
DataFrame/SQL-first so Catalyst/Tungsten plan the physical execution.
"""

from .session import build_session
from .registry import queries, oracles, REGISTRY

__all__ = ["build_session", "queries", "oracles", "REGISTRY"]
