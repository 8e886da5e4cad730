"""Similarity search over embedding columns (SURVEY.md §2.10).

Two tiers, as a production vector pipeline would ship them:

- ``q_llm_sim_topk``: exact brute-force cosine top-k — the correctness
  baseline. Query vectors are a small broadcast side; the corpus scan is
  embarrassingly parallel; per-pair work is a JVM-side HOF dot product
  (unit-norm vectors => cosine == dot). At 100 TB this is the "small
  query batch x huge corpus" shape: broadcast join, no shuffle of the
  corpus, top-k via per-query window rank on the (tiny) scored side.
- ``q_llm_sim_topk_lsh``: random-hyperplane LSH bucketing — the ANN
  scale path. Sign-bit buckets are computed per-vector by an
  Arrow-batched pandas UDF (numpy matmul, seeded planes); candidates
  are same-bucket only, so the pair space shrinks from N*Q to
  sum-per-bucket. The query reports recall@k against the exact result
  so the accuracy/cost trade is measured, not assumed. Deterministic
  (fixed seed) but not SQL-expressible => rows-only check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import load

TOP_K = 10
QUERY_STRIDE = 50  # vec_id % stride == 0 -> query set
LSH_PLANES = 8
LSH_SEED = 42


def _as_double(df: DataFrame) -> DataFrame:
    return df.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def _dot_expr(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


@query(
    "q_llm_sim_topk",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
        ),
        q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % {QUERY_STRIDE} = 0)
        SELECT qid, vec_id AS neighbor, rk,
               round(list_dot_product(qe, e), 6) AS cosine
        FROM (
            SELECT q.qid, v.vec_id, q.qe, v.e,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_dot_product(q.qe, v.e) DESC, v.vec_id) AS rk
            FROM q JOIN v ON v.vec_id <> q.qid
        )
        WHERE rk <= {TOP_K}
    """,
    description="Similarity search: exact brute-force cosine top-k per query vector",
    tags=("llm", "similarity", "topk"),
)
def q_llm_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    v = _as_double(load(spark, sf_dir, "embeddings"))
    q = v.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    scored = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", _dot_expr("qe", "e").alias("dot"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor"),
            "rk",
            F.round("dot", 6).alias("cosine"),
        )
    )


def _bucket_udf():
    """Sign-bit LSH bucket id via seeded random hyperplanes.

    The planes matrix is generated inside the UDF from the fixed seed so
    executors don't need a broadcast; at real scale broadcast the planes
    once instead of regenerating per batch.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("int")
    def bucket(emb: pd.Series) -> pd.Series:
        planes = np.random.default_rng(LSH_SEED).standard_normal((64, LSH_PLANES))
        mat = np.vstack(emb.to_numpy())  # (batch, 64)
        bits = (mat @ planes) > 0  # (batch, planes)
        vals = (bits * (1 << np.arange(LSH_PLANES))).sum(axis=1)
        return pd.Series(vals.astype("int32"))

    return bucket


@query(
    "q_llm_sim_topk_lsh",
    oracle=None,  # seeded-numpy hyperplanes are not SQL-expressible
    description="ANN similarity: random-hyperplane LSH buckets (pandas UDF), recall@k vs exact",
    tags=("llm", "similarity", "lsh", "ann"),
)
def q_llm_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    bucket = _bucket_udf()
    v = _as_double(emb).join(
        emb.select("vec_id", bucket("embedding").alias("bucket")), "vec_id"
    )
    q = v.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("bucket").alias("qbucket"),
    )

    def topk(joined: DataFrame, name: str) -> DataFrame:
        w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
        return (
            joined.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= TOP_K)
            .select("qid", F.col("vec_id").alias(name))
        )

    exact = topk(
        v.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
            "qid", "vec_id", _dot_expr("qe", "e").alias("dot")
        ),
        "exact_neighbor",
    )
    approx = topk(
        v.join(
            F.broadcast(q),
            (F.col("vec_id") != F.col("qid"))
            & (F.col("bucket") == F.col("qbucket")),
        ).select("qid", "vec_id", _dot_expr("qe", "e").alias("dot")),
        "lsh_neighbor",
    )
    hits = exact.join(
        approx,
        (exact.qid == approx.qid)
        & (exact.exact_neighbor == approx.lsh_neighbor),
        "left",
    ).groupBy(exact.qid.alias("qid")).agg(
        (F.count("lsh_neighbor") / float(TOP_K)).alias("recall_at_k")
    )
    return hits.orderBy("qid")
