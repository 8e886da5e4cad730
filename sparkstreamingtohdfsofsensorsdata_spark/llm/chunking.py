"""Document chunking + sequence packing for LLM training pipelines
(SURVEY.md §2.10 adjunct).

Chunking splits each document into overlapping token windows sized for
a model context; packing assigns chunks to fixed-budget training
sequences. Both are pure JVM column expressions:

- Chunking is a per-document fan-out: `sequence()` generates the chunk
  start offsets, `posexplode` multiplies rows executor-side AFTER the
  scan, `slice` + `array_join` materialize each chunk. No Python, no
  shuffle before the explosion, output row count ~ total_tokens/stride.
- Packing is the streaming-greedy approximation of bin packing: a
  running token total per (source) stream, `floor(cumsum/budget)` as
  the bin id. One window shuffle on the pack key. The exact bin-packing
  problem is NP-hard and irrelevant at corpus scale — every production
  packer uses a greedy pass like this.

At 100 TB: chunking is embarrassingly parallel (row-local); packing
shuffles once on the pack-stream key (source here; date+source in a
real pipeline) and the window runs in one pass per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks
PACK_BUDGET = 1024


@query(
    "q_llm_chunk",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
        ),
        starts AS (
            SELECT doc_id, source, t,
                   unnest(range(1, greatest(len(t) - {CHUNK_TOKENS // 4}, 1) + 1,
                                {CHUNK_STRIDE}))           AS start
            FROM toks
        )
        SELECT doc_id, source,
               CAST((start - 1) / {CHUNK_STRIDE} AS BIGINT)       AS chunk_id,
               start                                              AS tok_start,
               len(t[start : start + {CHUNK_TOKENS - 1}])         AS n_tokens,
               md5(array_to_string(t[start : start + {CHUNK_TOKENS - 1}], ' '))
                                                                  AS chunk_hash
        FROM starts
    """,
    description="Context-window chunking: overlapping 64-token windows via sequence+posexplode+slice",
    tags=("llm", "chunk"),
)
def q_llm_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 64-token chunks, stride 48. Start offsets run to
    n_tokens - 16 so a trailing fragment shorter than the overlap is
    absorbed into the previous chunk instead of emitted as a sliver
    (standard tokenizer-sharding behavior). The chunk text itself is
    reduced to an md5 so the oracle compares content without hauling
    full strings through the result."""
    docs = load(spark, sf_dir, "documents")
    t = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.size(t) - F.lit(CHUNK_TOKENS // 4), F.lit(1)),
        F.lit(CHUNK_STRIDE),
    )
    exploded = docs.select(
        "doc_id", "source", t.alias("t"), F.explode(starts).alias("start")
    )
    chunk = F.slice(F.col("t"), F.col("start"), CHUNK_TOKENS)
    return exploded.select(
        "doc_id",
        "source",
        ((F.col("start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").alias("tok_start"),
        F.size(chunk).alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )


@query(
    "q_llm_pack",
    oracle=f"""
        WITH chunks AS (
            SELECT doc_id, source,
                   len(string_split(text, ' ')) AS n_tokens
            FROM documents
            WHERE length(text) >= 100
        ),
        packed AS (
            SELECT source, doc_id, n_tokens,
                   CAST(floor((sum(n_tokens) OVER w - n_tokens)
                              / {PACK_BUDGET}) AS BIGINT) AS bin_id
            FROM chunks
            WINDOW w AS (PARTITION BY source ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        )
        SELECT source, bin_id,
               count(*)                          AS n_docs,
               CAST(sum(n_tokens) AS BIGINT)     AS bin_tokens,
               min(doc_id)                       AS first_doc,
               max(doc_id)                       AS last_doc
        FROM packed
        GROUP BY source, bin_id
    """,
    description="Sequence packing: greedy running-total assignment of docs into 1024-token training bins",
    tags=("llm", "pack"),
)
def q_llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy packing: within each source stream (ordered by doc_id),
    bin id = floor(tokens-before-this-doc / budget). Bins overflow by
    at most one document — the standard concat-then-split packing used
    for pretraining batches, not first-fit-decreasing (which needs a
    global sort by size and packs no tighter in practice)."""
    docs = load(spark, sf_dir, "documents").filter(F.length("text") >= 100)
    chunks = docs.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = chunks.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_BUDGET),
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


BUCKET_MIN_TOKENS = 16  # floor bucket: every shorter doc pads to 16


@query(
    "q_llm_length_bucket",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   greatest(CAST(ceil(length(text) / 4.0) AS BIGINT),
                            CAST(1 AS BIGINT)) AS toks
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ),
        b AS (
            SELECT toks,
                   CAST(greatest({BUCKET_MIN_TOKENS},
                        power(2, ceil(log2(CAST(toks AS DOUBLE)))))
                        AS BIGINT) AS bucket_len
            FROM d
        )
        SELECT bucket_len,
               count(*)                                  AS n_docs,
               CAST(sum(toks) AS BIGINT)                 AS tokens_total,
               CAST(count(*) * bucket_len AS BIGINT)     AS padded_total,
               round(1.0 - sum(toks)
                           / CAST(count(*) * bucket_len AS DOUBLE),
                     6)                                  AS pad_waste
        FROM b
        GROUP BY bucket_len
    """,
    description="Sequence-length bucketing: power-of-two token buckets with measured padding waste per bucket",
    tags=("llm", "batching", "tokens"),
)
def q_llm_length_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length bucketing — the batching-side complement of packing
    (q_llm_pack): dynamic-batching trainers group sequences into
    power-of-two length buckets so each batch pads only to its
    bucket's length, and the measured pad_waste per bucket is the
    number that decides the bucket grid. Empty/NULL docs are out of
    scope (they are filtered by corpus prep long before batching);
    every kept doc clamps to at least 1 token so log2 is defined, and
    buckets floor at {BUCKET_MIN_TOKENS} tokens (a real grid never
    allocates 1-token batches).

    Scale shape: two row-local expressions (token estimate, bucket id)
    and ONE map-side-combined groupBy on a ~dozen-value key — the
    cheapest possible full-corpus statistic; no join, no window, no
    Python anywhere."""
    docs = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    toks = F.greatest(F.ceil(F.length("text") / 4.0), F.lit(1)).cast("long")
    bucket = F.greatest(
        F.lit(BUCKET_MIN_TOKENS),
        F.pow(F.lit(2.0), F.ceil(F.log2(toks.cast("double")))),
    ).cast("long")
    return (
        docs.select(toks.alias("toks"), bucket.alias("bucket_len"))
        .groupBy("bucket_len")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("tokens_total"),
            (F.count(F.lit(1)) * F.first("bucket_len")).alias("padded_total"),
            F.round(
                1.0
                - F.sum("toks")
                / (F.count(F.lit(1)) * F.first("bucket_len")).cast("double"),
                6,
            ).alias("pad_waste"),
        )
    )


CURRICULUM_TIERS = 4
# Chunk width for the two-level global rank over the difficulty spine
# (operators/ranking recipe 2: low-cardinality metric + unique tiebreak
# split across id ranges).
CURRICULUM_ID_CHUNK = 4096


@query(
    "q_llm_curriculum",
    oracle=f"""
        WITH d AS (
            SELECT doc_id,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS difficulty
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ),
        r AS (
            SELECT doc_id, difficulty,
                   row_number() OVER (ORDER BY difficulty, doc_id) AS rk,
                   count(*) OVER () AS n
            FROM d
        ),
        t AS (
            SELECT difficulty,
                   CAST((rk - 1) * {CURRICULUM_TIERS} // n + 1 AS BIGINT)
                       AS tier
            FROM r
        )
        SELECT tier,
               CAST(count(*) AS BIGINT)        AS n_docs,
               CAST(min(difficulty) AS BIGINT) AS min_difficulty,
               CAST(max(difficulty) AS BIGINT) AS max_difficulty,
               CAST(sum(difficulty) AS BIGINT) AS tokens_total
        FROM t GROUP BY tier
    """,
    description=f"Curriculum tiering: documents ranked by estimated token difficulty into {CURRICULUM_TIERS} equal tiers via the two-level chunked global rank (rank-arithmetic ntile, no single-partition sort)",
    tags=("llm", "chunking", "sampling"),
)
def q_llm_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning tier assignment: order the corpus by a
    difficulty proxy (estimated BPE token count — longer docs cost and
    teach more) and cut it into equal-population tiers a scheduler
    feeds easy-to-hard. The tier is RANK ARITHMETIC ((rank-1)*T div n
    + 1, the q_agg_rfm quintile idiom) over a TWO-LEVEL chunked global
    rank (operators/ranking) — ntile() would single-partition-sort the
    corpus; the chunk spine ((difficulty, doc_id-range)) keeps every
    local window bounded. Boundary: NULL/empty docs are outside (no
    difficulty), shared with the fertility/ensemble keys.

    Scale shape: one scan + the two-level rank (bounded local windows
    + broadcast chunk offsets) + one map-side-combined groupBy onto
    CURRICULUM_TIERS rows."""
    from ..operators.ranking import chunked_row_number

    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "doc_id",
            F.ceil(F.length("text") / 4.0).cast("long").alias("difficulty"),
        )
    )
    ranked = chunked_row_number(
        d,
        ["difficulty", "doc_id"],
        [
            F.col("difficulty"),
            F.floor(F.col("doc_id") / CURRICULUM_ID_CHUNK).cast("long"),
        ],
        rank_name="rk",
    )
    n = ranked.agg(F.count(F.lit(1)).alias("n"))
    t = ranked.crossJoin(F.broadcast(n)).select(
        "difficulty",
        F.expr(f"((rk - 1) * {CURRICULUM_TIERS}) div n + 1")
        .cast("long")
        .alias("tier"),
    )
    return t.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("difficulty").alias("min_difficulty"),
        F.max("difficulty").alias("max_difficulty"),
        F.sum("difficulty").alias("tokens_total"),
    )
