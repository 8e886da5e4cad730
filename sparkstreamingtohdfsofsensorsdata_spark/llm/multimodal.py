"""Multimodal columns (SURVEY.md §2.10): opaque binary payloads + typed
metadata, processed by Arrow-batched pandas functions over mapInPandas.

The image/audio decode libraries are not available in this environment,
so the decode step is split in two:

- the Spark-side plumbing — binary column, metadata struct, Arrow batch
  iteration, output schema, partition parallelism — is REAL and tested
  (the fake decoder derives features deterministically from the bytes,
  so the whole path is oracle-checkable);
- the actual codec call is stubbed behind ``decode_image``, which
  raises NotImplementedError until a codec (PIL/ffmpeg) is installed.

At 100 TB the same plan holds: binary payloads stay columnar in parquet
(never row-pickled), mapInPandas streams Arrow record batches through
the Python worker, and per-batch vectorized numpy does the feature
math. Partition sizing is governed by payload bytes, not row count —
set spark.sql.files.maxPartitionBytes accordingly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import load


def decode_image(payload: bytes) -> "object":
    """Real codec hook — requires an image library not present here.

    >>> decode_image(b"...")  # doctest: +SKIP
    NotImplementedError: install PIL/pillow to decode image payloads
    """
    raise NotImplementedError("install PIL/pillow to decode image payloads")


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode + feature extraction: byte
    length, first byte, and metadata-derived dimensions — all
    vectorized per Arrow batch."""
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payload.str.len().astype("int64"),
                "head_byte": payload.apply(lambda b: b[0]).astype("int32"),
                "width": pdf["meta_width"],
                "height": pdf["meta_height"],
            }
        )


@query(
    "q_llm_multimodal",
    oracle="""
        SELECT doc_id,
               octet_length(encode(text))       AS n_bytes,
               ascii(substr(text, 1, 1))        AS head_byte,
               64 + doc_id % 512                AS width,
               64 + (doc_id // 7) % 512         AS height
        FROM documents
        WHERE doc_id % 4 = 0
    """,
    description="Multimodal columns: binary payload + metadata struct -> mapInPandas feature extraction",
    tags=("llm", "multimodal"),
)
def q_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 4 == 0)
    modal = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        (F.lit(64) + F.col("doc_id") % 512).alias("meta_width"),
        (F.lit(64) + F.expr("doc_id div 7") % 512).alias("meta_height"),
    )
    return modal.mapInPandas(_extract_features, FEATURE_SCHEMA)
