"""Benchmark decontamination for LLM training corpora (SURVEY.md §2.10
adjunct).

A training corpus must not contain the evaluation benchmark. The
standard check is n-gram overlap: a document is contaminated if it
shares any (hashed) token 8-gram with any benchmark item. The scale
shape:

- Benchmark side: tiny (thousands of items) → its distinct shingle-hash
  set is broadcast; the corpus never shuffles for the membership test.
- Corpus side: shingles are generated per-document with JVM HOFs,
  exploded, and semi-joined against the broadcast set. The explosion is
  row-local; the only shuffle is the final per-source aggregation.
- Hashing (md5 here; 64-bit xxhash in production) keeps the join keys
  fixed-width — never join on raw n-gram strings at 100 TB.

The fixture has no separate benchmark table, so a deterministic slice
of `documents` (doc_id % 7 = 0) plays the benchmark; its members are
excluded from the corpus side, and near-duplicates planted by the
fixture generator provide true positives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

NGRAM = 8

# One md5 per token 8-gram. Mirrored 1:1 in the DuckDB oracle.
_SHINGLE_EXPR = (
    "array_distinct(transform("
    f"  sequence(1, greatest(size(toks) - {NGRAM - 1}, 1)),"
    f"  i -> md5(array_join(slice(toks, i, {NGRAM}), ' '))))"
)


@query(
    "q_llm_contamination",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
        ),
        sh AS (
            SELECT doc_id, source,
                   unnest(list_distinct(list_transform(
                       range(1, greatest(len(t) - {NGRAM - 1}, 1) + 1),
                       i -> md5(array_to_string(t[i : i + {NGRAM - 1}], ' ')))))
                                                              AS h
            FROM toks
        ),
        bench AS (
            SELECT DISTINCT h FROM sh WHERE doc_id % 7 = 0
        ),
        corpus_hits AS (
            SELECT DISTINCT s.doc_id, s.source
            FROM sh s JOIN bench b USING (h)
            WHERE s.doc_id % 7 <> 0
        )
        SELECT c.source,
               c.n_docs,
               CAST(coalesce(k.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               coalesce(k.first_hit, -1)                     AS first_hit
        FROM (SELECT source, count(*) AS n_docs
              FROM documents WHERE doc_id % 7 <> 0 GROUP BY source) c
        LEFT JOIN (SELECT source, count(*) AS n_contaminated,
                          min(doc_id) AS first_hit
                   FROM corpus_hits GROUP BY source) k USING (source)
    """,
    description="Benchmark decontamination: hashed 8-gram overlap vs broadcast benchmark set, per-source counts",
    tags=("llm", "dedup", "contamination"),
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus documents sharing any token-8-gram hash with the
    benchmark slice. The benchmark shingle set is broadcast (it is tiny
    by construction — eval sets are thousands of items, not billions),
    so the corpus-side membership test is shuffle-free; LeftSemi stops
    at the first matching shingle per document."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        F.split(F.col("text"), " ").alias("toks"),
    ).select(
        "doc_id", "source", F.explode(F.expr(_SHINGLE_EXPR)).alias("h")
    )
    bench = sh.filter(F.col("doc_id") % 7 == 0).select("h").distinct()
    hits = (
        sh.filter(F.col("doc_id") % 7 != 0)
        .join(F.broadcast(bench), "h", "left_semi")
        .select("doc_id", "source")
        .distinct()
    )
    per_source = docs.filter(F.col("doc_id") % 7 != 0).groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    hit_agg = hits.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_contaminated"),
        F.min("doc_id").alias("first_hit"),
    )
    return per_source.join(F.broadcast(hit_agg), "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
        F.coalesce("first_hit", F.lit(-1)).alias("first_hit"),
    )
