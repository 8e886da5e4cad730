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


def ngram_md5_expr(n: int, toks: str = "toks") -> str:
    """Spark-side distinct token-n-gram md5 shingle set over a token
    array column, with the too-short guard (a sub-n-gram document
    yields exactly one truncated shingle, never a fabricated one).
    THE canonical template — q_llm_contamination (n=8) and
    q_llm_boilerplate (n=6) both build from it, so a guard-semantics
    fix lands in every consumer at once (review r6)."""
    return (
        "array_distinct(transform("
        f"  sequence(1, greatest(size({toks}) - {n - 1}, 1)),"
        f"  i -> md5(array_join(slice({toks}, i, {n}), ' '))))"
    )


def ngram_md5_sql(n: int, toks: str = "t") -> str:
    """DuckDB mirror of ngram_md5_expr, 1:1 semantics (range is
    end-exclusive where sequence is inclusive; list slicing is
    end-inclusive where slice takes a length)."""
    return (
        "list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {n - 1}, 1) + 1), "
        f"i -> md5(array_to_string({toks}[i : i + {n - 1}], ' '))))"
    )


# One md5 per token 8-gram. Mirrored 1:1 in the DuckDB oracle.
_SHINGLE_EXPR = ngram_md5_expr(NGRAM)


def _source_shingle_groups(docs: DataFrame) -> DataFrame:
    """(h -> collect_set(source)) over all 8-gram shingles — the
    un-checkpointed build plan of q_llm_source_overlap's grouped
    table, split out so tests/test_plans.py can gate its shape (the
    lazy localCheckpoint in the key truncates the inspectable plan to
    a block scan). collect_set absorbs the old separate DISTINCT:
    (source, h) dedup happens inside the aggregation buffer."""
    return (
        docs.select(
            "source",
            F.explode(
                F.expr(ngram_md5_expr(NGRAM, "split(text, ' ')"))
            ).alias("h"),
        )
        .groupBy("h")
        .agg(F.collect_set("source").alias("ss"))
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
                   unnest({ngram_md5_sql(NGRAM)}) AS h
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


# train/val/test boundaries on the md5-hex prefix: < 'cc' (~80%) train,
# < 'e6' (~10%) val, rest test.
SPLIT_CASE = (
    "CASE WHEN substring(md5({key}), 1, 2) < 'cc' THEN 'train' "
    "WHEN substring(md5({key}), 1, 2) < 'e6' THEN 'val' "
    "ELSE 'test' END"
)

# The fixture has no exact duplicates (500/500 distinct texts), so the
# leakage audit clones every 10th document under a shifted id — the
# same inject-what-you-audit approach as the PII query.
DUP_ID_SHIFT = 1_000_000


@query(
    "q_llm_split_leakage",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {DUP_ID_SHIFT}, text
            FROM documents WHERE doc_id % 10 = 0
        ),
        d AS (
            SELECT doc_id, md5(text) AS h,
                   {SPLIT_CASE.format(key="CAST(doc_id AS VARCHAR)")} AS split_by_id,
                   {SPLIT_CASE.format(key="md5(text)")}               AS split_by_content
            FROM corpus
        ),
        leaks AS (
            SELECT h,
                   count(*) AS group_sz,
                   count(DISTINCT split_by_id)      AS id_splits,
                   count(DISTINCT split_by_content) AS content_splits
            -- h IS NOT NULL: NULL-text docs never participate in content
            -- dedup (family rule, same as q_llm_exact_dedup) — GROUP BY
            -- treats NULLs as equal on both engines, so without the
            -- guard two contentless docs read as one dup group
            FROM d WHERE h IS NOT NULL GROUP BY h HAVING count(*) > 1
        )
        SELECT method, n_train, n_val, n_test, n_dup_groups, n_leaked_groups
        FROM (
            SELECT 'by_id' AS method,
                   CAST(count(*) FILTER (split_by_id = 'train') AS BIGINT) AS n_train,
                   CAST(count(*) FILTER (split_by_id = 'val')   AS BIGINT) AS n_val,
                   CAST(count(*) FILTER (split_by_id = 'test')  AS BIGINT) AS n_test,
                   (SELECT CAST(count(*) AS BIGINT) FROM leaks) AS n_dup_groups,
                   (SELECT CAST(count(*) FILTER (id_splits > 1) AS BIGINT)
                    FROM leaks)                                 AS n_leaked_groups
            FROM d
            UNION ALL
            SELECT 'by_content',
                   CAST(count(*) FILTER (split_by_content = 'train') AS BIGINT),
                   CAST(count(*) FILTER (split_by_content = 'val')   AS BIGINT),
                   CAST(count(*) FILTER (split_by_content = 'test')  AS BIGINT),
                   (SELECT CAST(count(*) AS BIGINT) FROM leaks),
                   (SELECT CAST(count(*) FILTER (content_splits > 1) AS BIGINT)
                    FROM leaks)
            FROM d
        )
    """,
    description="Train/val/test split with leakage audit: id-keyed split leaks duplicate groups, content-keyed split cannot",
    tags=("llm", "split", "dedup"),
)
def q_llm_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus splitting plus the audit that catches the
    classic mistake: hashing the DOCUMENT ID spreads exact duplicates
    across train and test (evaluation leakage), while hashing the
    CONTENT pins every duplicate group to one split by construction.
    Both assignments use the md5-prefix-range trick from
    q_sample_hash, so splits are reproducible on any cluster layout
    and the scan-side predicate pushes down.

    Shape: ONE corpus scan, ONE shuffle. The per-row assignments feed a
    single groupBy(h) that carries BOTH the per-group split tallies
    (summed up to the global train/val/test counts — sums of per-group
    counts equal the row counts) and the audit's distinct-split
    counters; a second 1-row aggregation over the (tiny) per-hash table
    derives all twelve output numbers, and the two output rows explode
    from that single row. The previous form re-executed the corpus-wide
    md5/split projection once for the audit and once per method branch
    (review r6) — pure wasted scan I/O at 100 TB, identical output.
    On the duplicate-injected corpus, by_id leaks (> 0 groups),
    by_content provably cannot (gated in tests, not just asserted
    here).
    """
    docs = load(spark, sf_dir, "documents")
    # Duplicate injection via a row-local explode, not a self-union: the
    # union form read the documents file TWICE (base + slice); this is
    # one scan with a 1-or-2-element array fan-out per row.
    base = F.struct(F.col("doc_id"), F.col("text"))
    shifted = F.struct(
        (F.col("doc_id") + DUP_ID_SHIFT).alias("doc_id"), F.col("text")
    )
    corpus = docs.select(
        F.explode(
            F.when(F.col("doc_id") % 10 == 0, F.array(base, shifted)).otherwise(
                F.array(base)
            )
        ).alias("r")
    ).select("r.doc_id", "r.text")
    d = corpus.select(
        "doc_id",
        F.md5("text").alias("h"),
        F.expr(SPLIT_CASE.format(key="CAST(doc_id AS STRING)")).alias(
            "split_by_id"
        ),
        F.expr(SPLIT_CASE.format(key="md5(text)")).alias("split_by_content"),
    )

    def _tally(col: str, val: str, name: str):
        return F.sum((F.col(col) == val).cast("long")).alias(name)

    per_h = d.groupBy("h").agg(
        F.count("*").alias("group_sz"),
        _tally("split_by_id", "train", "id_train"),
        _tally("split_by_id", "val", "id_val"),
        _tally("split_by_id", "test", "id_test"),
        _tally("split_by_content", "train", "ct_train"),
        _tally("split_by_content", "val", "ct_val"),
        _tally("split_by_content", "test", "ct_test"),
        # size(collect_set) not countDistinct: two distinct aggregates
        # in one groupBy trigger the Expand/double-shuffle rewrite
        # (corpus-volume rows through TWO exchanges); a collect_set of
        # a column with <= 3 values is a bounded map-side set and the
        # whole per-hash table builds in the ONE groupBy(h) shuffle.
        F.size(F.collect_set("split_by_id")).alias("id_splits"),
        F.size(F.collect_set("split_by_content")).alias("content_splits"),
    )
    # h IS NOT NULL on the audit terms only: NULL-text docs never
    # participate in content dedup (family rule, q_llm_exact_dedup),
    # but their rows still count in the split totals.
    is_dup = F.col("h").isNotNull() & (F.col("group_sz") > 1)
    combined = per_h.agg(
        F.sum("id_train").alias("id_train"),
        F.sum("id_val").alias("id_val"),
        F.sum("id_test").alias("id_test"),
        F.sum("ct_train").alias("ct_train"),
        F.sum("ct_val").alias("ct_val"),
        F.sum("ct_test").alias("ct_test"),
        F.sum(is_dup.cast("long")).alias("n_dup_groups"),
        F.sum((is_dup & (F.col("id_splits") > 1)).cast("long")).alias(
            "id_leaks"
        ),
        F.sum((is_dup & (F.col("content_splits") > 1)).cast("long")).alias(
            "content_leaks"
        ),
    )

    def row(method: str, prefix: str, leak_col: str):
        return F.struct(
            F.lit(method).alias("method"),
            F.col(f"{prefix}_train").alias("n_train"),
            F.col(f"{prefix}_val").alias("n_val"),
            F.col(f"{prefix}_test").alias("n_test"),
            F.col("n_dup_groups"),
            F.col(leak_col).alias("n_leaked_groups"),
        )

    return combined.select(
        F.explode(
            F.array(row("by_id", "id", "id_leaks"), row("by_content", "ct", "content_leaks"))
        ).alias("r")
    ).select("r.*")


# Deterministic train/val/test assignment thresholds over the md5-uniform
# unit fraction (the q_llm_mix_sample idiom): [0, .8) train, [.8, .9)
# val, [.9, 1) test.
SPLIT_TRAIN_FRAC = 0.8
SPLIT_VAL_FRAC = 0.9


@query(
    "q_llm_split_assign",
    oracle=f"""
        WITH d AS (
            SELECT source,
                   CAST(ceil(length(coalesce(text, '')) / 4.0) AS BIGINT) AS toks,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                       / 65536.0 AS u
            FROM documents
        ),
        tagged AS (
            SELECT source, toks,
                   CASE WHEN u < {SPLIT_TRAIN_FRAC} THEN 'train'
                        WHEN u < {SPLIT_VAL_FRAC}   THEN 'val'
                        ELSE 'test' END AS split
            FROM d
        )
        SELECT split, source,
               count(*)                     AS n_docs,
               CAST(sum(toks) AS BIGINT)    AS tokens_total
        FROM tagged
        GROUP BY split, source
    """,
    description="Deterministic hash-based train/val/test assignment with per-split per-source sizes",
    tags=("llm", "split", "sampling"),
)
def q_llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The splitter q_llm_split_leakage audits: assignment is a pure
    function of the STABLE doc_id (md5 unit fraction against fixed
    thresholds), so membership survives reprocessing, re-partitioning,
    and corpus growth — new documents land in splits at the target
    rates without moving any existing document (the property
    rand()-based splitting destroys). Per (split, source) doc and
    token totals come back so split balance is measured per domain,
    not just globally.

    Scale shape: one row-local hash + threshold per document and one
    map-side-combined groupBy on a |splits| x |sources| key — no join,
    no window, no Python; the same full-corpus-statistic floor as
    q_llm_length_bucket."""
    docs = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("double") / F.lit(65536.0)
    split = (
        F.when(u < SPLIT_TRAIN_FRAC, "train")
        .when(u < SPLIT_VAL_FRAC, "val")
        .otherwise("test")
    )
    toks = F.ceil(F.length(F.coalesce("text", F.lit(""))) / 4.0).cast("long")
    return (
        docs.select("source", split.alias("split"), toks.alias("toks"))
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("tokens_total"),
        )
    )


@query(
    "q_llm_source_overlap",
    oracle=f"""
        WITH sh AS (
            SELECT DISTINCT source,
                   unnest({ngram_md5_sql(NGRAM, "string_split(text, ' ')")}) AS h
            FROM documents
            WHERE text IS NOT NULL
        ),
        totals AS (
            SELECT source, count(*) AS n_sh FROM sh GROUP BY 1
        ),
        pairs AS (
            SELECT a.source AS s1, b.source AS s2,
                   CAST(count(*) AS BIGINT) AS shared
            FROM sh a JOIN sh b ON a.h = b.h AND a.source < b.source
            GROUP BY 1, 2
        )
        SELECT p.s1, p.s2, p.shared,
               round(p.shared / CAST(least(ta.n_sh, tb.n_sh) AS DOUBLE), 6)
                   AS overlap_coef
        FROM pairs p
        JOIN totals ta ON p.s1 = ta.source
        JOIN totals tb ON p.s2 = tb.source
    """,
    description="Cross-source duplication matrix: shared 8-gram shingles + overlap coefficient per source pair",
    tags=("llm", "contamination", "dedup"),
)
def q_llm_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-curation diagnostic that tells you WHERE duplication
    comes from before you pay for document-level dedup: for every pair
    of sources, the count of distinct 8-gram shingles they share and
    the overlap coefficient shared/min(|A|, |B|) (Szymkiewicz-Simpson
    — robust when one source dwarfs the other, exactly the
    CommonCrawl-vs-curated-wiki case). Shingles ride the canonical
    md5 template shared with q_llm_contamination / q_llm_boilerplate.

    Scale shape (r15 rewrite — the self-join is GONE): ONE shuffle on
    the shingle hash builds (h -> set of sources) via collect_set
    (which absorbs the old separate DISTINCT — set semantics dedupe
    (source, h) inside the aggregation buffer), then the source pairs
    per shingle are generated ROW-LOCALLY from the set (array
    comprehension, y > x for deterministic unordered pairs) and
    map-side-combine into the |sources|^2-bounded pair key space. The
    fan-out per shingle is bounded by SOURCE cardinality (tens), not
    corpus size — a boilerplate shingle present everywhere emits
    C(|sources|, 2) structs from one row, still trivial. Per-source
    distinct-shingle totals come from exploding the SAME grouped
    table — shared through a LAZY localCheckpoint, because exchange
    reuse does NOT fire across the re-aliased subtrees (verified on
    the executed plan; see the inline comment and
    test_source_overlap_one_shuffle_no_selfjoin): the checkpoint
    materializes the grouped table once and the three legs re-read
    its blocks, so the scan+md5+shuffle is still paid exactly once.
    The old plan's second full shuffle + sort-merge self-join (the
    r14 ramp's 3.87x worst-LLM slope) no longer exists. Per-source
    totals are a |sources|-row broadcast.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Lazy checkpoint: the grouped table feeds THREE legs (pairs + the
    # two totals sides); without it Catalyst re-derives the full
    # scan+shingle+shuffle per leg (exchange reuse does not fire
    # across the re-aliased subtrees — verified on the executed plan),
    # tripling the md5 work. One materialization, three block reads.
    grouped = _source_shingle_groups(docs).localCheckpoint(eager=False)
    totals = (
        grouped.select(F.explode("ss").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sh"))
    )
    pairs = (
        grouped.filter(F.size("ss") > 1)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ss, x ->"
                    " transform(filter(ss, y -> y > x),"
                    " y -> struct(x AS s1, y AS s2))))"
                )
            ).alias("p")
        )
        .select("p.s1", "p.s2")
        .groupBy("s1", "s2")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    ta = totals.select(
        F.col("source").alias("s1"), F.col("n_sh").alias("n1")
    )
    tb = totals.select(
        F.col("source").alias("s2"), F.col("n_sh").alias("n2")
    )
    return (
        pairs.join(F.broadcast(ta), "s1")
        .join(F.broadcast(tb), "s2")
        .select(
            "s1",
            "s2",
            "shared",
            F.round(
                F.col("shared") / F.least("n1", "n2").cast("double"), 6
            ).alias("overlap_coef"),
        )
    )


N_SHARDS = 16  # training-shard fan-out


@query(
    "q_llm_shard_assign",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source,
                   CAST(ceil(length(coalesce(text, '')) / 4.0) AS BIGINT)
                       AS toks,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 5, 4))::INT
                       % {N_SHARDS} AS shard
            FROM documents
        )
        SELECT shard,
               CAST(count(*) AS BIGINT)            AS n_docs,
               CAST(sum(toks) AS BIGINT)           AS tokens_total,
               CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
               CAST(min(doc_id) AS BIGINT)         AS min_doc,
               CAST(max(doc_id) AS BIGINT)         AS max_doc
        FROM d GROUP BY shard
    """,
    description=f"Deterministic global-shuffle shard assignment (md5 mod {N_SHARDS}) with per-shard balance audit",
    tags=("llm", "split", "sampling"),
)
def q_llm_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic global shuffle a training run reads from:
    every document lands in shard md5(doc_id) mod {shards} — a pure
    function of the stable id, so the shard layout is identical across
    reprocessing runs, cluster sizes, and engines, and a data-loader
    can re-derive any document's location without an index. (Training
    order within a shard is the md5-lexicographic order — a second
    pure function; this key audits the SHARD layer.) The output is the
    balance audit run before a training job: per-shard doc/token
    totals (skewed shards starve data-parallel workers), source
    diversity (a shard missing a domain biases its gradient batches),
    and the id range as a quick fingerprint.

    Unlike q_llm_split_assign's THRESHOLD assignment (membership
    stable under corpus growth, sizes proportional), modulo
    assignment gives exact-as-possible equal shard sizes — the right
    tool when the consumer is N parallel readers rather than held-out
    evaluation.

    Scale shape: one row-local hash + mod per document, one
    map-side-combined groupBy onto {shards} keys; count(DISTINCT
    source) partials stay bounded by the source vocabulary. No join,
    no window, no Python."""
    docs = load(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 5, 4), 16, 10)
        .cast("long")
        % N_SHARDS
    ).alias("shard")
    toks = F.ceil(F.length(F.coalesce("text", F.lit(""))) / 4.0).cast("long")
    return (
        docs.select(shard, F.col("source"), F.col("doc_id"), toks.alias("toks"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("toks").alias("tokens_total"),
            F.count_distinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


q_llm_shard_assign.__doc__ = q_llm_shard_assign.__doc__.format(shards=N_SHARDS)
