"""Corpus-level statistical diagnostics (SURVEY.md §2.10 extension):
Zipf rank-frequency slope, Heaps vocabulary-growth curve, duplicate
n-gram coverage (the RefinedWeb/Gopher repetition metric), and
cross-split n-gram novelty.

These are the measurements a training-data pipeline runs BETWEEN
filtering stages: dup-ngram coverage quantifies how much boilerplate
dedup still has to remove, the Zipf slope and Heaps curve flag
distribution shift after aggressive filtering (a too-steep slope or a
flat vocab curve means the filter collapsed diversity), and n-gram
novelty measures test-split independence beyond exact-duplicate
leakage. All four are pure relational plans — explode + join + agg,
no Python in the hot path — so they run as cheaply as any groupBy at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .contamination import (
    SPLIT_TRAIN_FRAC,
    SPLIT_VAL_FRAC,
    ngram_md5_expr,
    ngram_md5_sql,
)

ZIPF_TOP = 500  # rank-frequency regression depth per source


@query(
    "q_llm_zipf_slope",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        freq AS (
            SELECT source, t, count(*) AS f
            FROM tok WHERE t <> '' GROUP BY source, t
        ),
        ranked AS (
            SELECT source, f,
                   row_number() OVER (
                       PARTITION BY source ORDER BY f DESC, t
                   ) AS r
            FROM freq
        )
        SELECT source,
               CAST(count(*) AS BIGINT)            AS n_ranked,
               round(regr_slope(ln(f), ln(r)), 6)  AS zipf_slope
        FROM ranked WHERE r <= {ZIPF_TOP}
        GROUP BY source
    """,
    description=f"Zipf rank-frequency slope per source (log-log OLS over top {ZIPF_TOP} tokens)",
    tags=("llm", "text", "stats"),
)
def q_llm_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law diagnostic: OLS slope of ln(freq) on ln(rank) over
    each source's top tokens (natural text sits near -1; a corpus
    whose filtering collapsed diversity drifts steep). Frequency ties
    rank deterministically by token so both engines regress the same
    point set.

    Scale shape: explode + map-side-combined count per (source,
    token), one window for ranks partitioned by source, and
    regr_slope — a pure algebraic aggregate (sums of x, y, xy, xx) so
    it combines map-side like any sum. The rank window's skew bound
    is vocab size per source, not corpus size."""
    tok = (
        load(spark, sf_dir, "documents")
        .select("source", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    freq = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("f"))
    w = Window.partitionBy("source").orderBy(F.col("f").desc(), F.col("t"))
    ranked = freq.withColumn("r", F.row_number().over(w)).filter(
        F.col("r") <= ZIPF_TOP
    )
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.round(F.regr_slope(F.ln("f"), F.ln("r")), 6).alias("zipf_slope"),
    )


VOCAB_BUCKET_DOCS = 100  # Heaps-curve resolution: docs per bucket
VOCAB_CHUNK_BUCKETS = 1024  # spine buckets per prefix-sum chunk


@query(
    "q_llm_vocab_growth",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id // {VOCAB_BUCKET_DOCS} AS bucket,
                   unnest(string_split(text, ' ')) AS t
            FROM documents
        ),
        per_bucket AS (
            SELECT bucket, count(*) AS n_tok FROM tok
            WHERE t <> '' GROUP BY bucket
        ),
        first_seen AS (
            SELECT t, min(bucket) AS first_bucket FROM tok
            WHERE t <> '' GROUP BY t
        ),
        new_vocab AS (
            SELECT first_bucket AS bucket, count(*) AS n_new
            FROM first_seen GROUP BY first_bucket
        )
        SELECT p.bucket,
               CAST(sum(p.n_tok) OVER w AS BIGINT)                 AS cum_tokens,
               CAST(sum(coalesce(v.n_new, 0)) OVER w AS BIGINT)    AS cum_vocab
        FROM per_bucket p LEFT JOIN new_vocab v USING (bucket)
        WINDOW w AS (ORDER BY p.bucket
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    description=f"Heaps'-law vocabulary growth: cumulative tokens vs cumulative distinct vocab per {VOCAB_BUCKET_DOCS}-doc bucket",
    tags=("llm", "text", "stats"),
)
def q_llm_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law curve: walking the corpus in doc_id order, cumulative
    token count vs cumulative distinct-vocabulary size at every
    VOCAB_BUCKET_DOCS-document boundary. A healthy corpus keeps
    growing sublinearly; a flat curve after a filter stage means the
    filter collapsed lexical diversity.

    Scale shape: "first occurrence" is min(bucket) per token — one
    map-side-combined groupBy over the exploded stream, never a sort
    of the corpus. The cumulative sums are a TWO-LEVEL prefix sum
    (VERDICT r9 item 5): the bucket spine (corpus/{VOCAB_BUCKET_DOCS}
    rows — 10^7+ at 100 TB, too big for one unpartitioned WindowExec)
    is chunked into {VOCAB_CHUNK_BUCKETS}-bucket chunks; each chunk's
    running sums ride a window PARTITIONED by chunk (bounded
    {VOCAB_CHUNK_BUCKETS} rows per partition), and each chunk's offset
    is the exclusive prefix over the chunk-total table — which is
    spine/{VOCAB_CHUNK_BUCKETS} AGGREGATED rows (10^4 at 100 TB), the
    same provably-tiny class as the repo's other unpartitioned windows
    — broadcast back onto the chunked spine. Same answer, no
    single-partition sort of an unbounded spine."""
    tok = (
        load(spark, sf_dir, "documents")
        .select(
            (F.floor(F.col("doc_id") / VOCAB_BUCKET_DOCS))
            .cast("long")
            .alias("bucket"),
            F.explode(F.split("text", " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    per_bucket = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tok"))
    new_vocab = (
        tok.groupBy("t")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    spine = (
        per_bucket.join(new_vocab, "bucket", "left")
        .select(
            "bucket",
            F.col("n_tok"),
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            (F.floor(F.col("bucket") / VOCAB_CHUNK_BUCKETS))
            .cast("long")
            .alias("chunk"),
        )
    )
    w_local = (
        Window.partitionBy("chunk")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = spine.select(
        "bucket",
        "chunk",
        F.sum("n_tok").over(w_local).alias("loc_tok"),
        F.sum("n_new").over(w_local).alias("loc_new"),
    )
    chunk_tot = spine.groupBy("chunk").agg(
        F.sum("n_tok").alias("c_tok"), F.sum("n_new").alias("c_new")
    )
    # exclusive prefix over the AGGREGATED chunk table (tiny by
    # construction): rows strictly before the current chunk
    w_chunks = (
        Window.orderBy("chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = chunk_tot.select(
        "chunk",
        F.coalesce(F.sum("c_tok").over(w_chunks), F.lit(0)).alias("off_tok"),
        F.coalesce(F.sum("c_new").over(w_chunks), F.lit(0)).alias("off_new"),
    )
    return local.join(F.broadcast(offsets), "chunk").select(
        "bucket",
        (F.col("loc_tok") + F.col("off_tok")).cast("long").alias("cum_tokens"),
        (F.col("loc_new") + F.col("off_new")).cast("long").alias("cum_vocab"),
    )


DUP_NGRAM = 8  # the RefinedWeb duplicate-n-gram metric's n


@query(
    "q_llm_dup_ngram_coverage",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
        ),
        sh AS (
            SELECT doc_id, source, unnest({ngram_md5_sql(DUP_NGRAM)}) AS h
            FROM toks
        ),
        cnt AS (
            SELECT h, count(*) AS n_docs_with FROM sh GROUP BY h
        ),
        per_doc AS (
            SELECT s.doc_id, s.source,
                   count(*) AS n_sh,
                   sum(CASE WHEN c.n_docs_with >= 2 THEN 1 ELSE 0 END) AS n_dup
            FROM sh s JOIN cnt c USING (h)
            GROUP BY s.doc_id, s.source
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                       AS n_docs,
               round(avg(n_dup * 1.0 / n_sh), 6)              AS avg_dup_frac,
               CAST(sum(CASE WHEN n_dup * 2 > n_sh
                             THEN 1 ELSE 0 END) AS BIGINT)    AS n_majority_dup
        FROM per_doc GROUP BY source
    """,
    description=f"Duplicate {DUP_NGRAM}-gram coverage per source (RefinedWeb repetition metric)",
    tags=("llm", "dedup", "stats"),
)
def q_llm_dup_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document fraction of token-8-grams shared with ANY other
    document, averaged per source, plus the count of majority-
    duplicated documents (the ones passage/fuzzy dedup should have
    caught). Because each document contributes its DISTINCT shingle
    set, a shingle's occurrence count IS its document frequency.

    Scale shape: the shingle-frequency table joins back to the
    exploded stream on the md5 key — both sides hash-partition on h,
    one co-partitioned shuffle each; the shuffle carries 16-byte
    hashes, never text (the q_llm_passage_dedup rule). The majority
    test is integer (n_dup * 2 > n_sh), no float boundary."""
    sh = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "source", F.split("text", " ").alias("toks"))
        .select(
            "doc_id",
            "source",
            F.explode(F.expr(ngram_md5_expr(DUP_NGRAM))).alias("h"),
        )
    )
    cnt = sh.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs_with"))
    per_doc = (
        sh.join(cnt, "h")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum((F.col("n_docs_with") >= 2).cast("long")).alias("n_dup"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg(F.col("n_dup") / F.col("n_sh")), 6).alias("avg_dup_frac"),
        F.sum((F.col("n_dup") * 2 > F.col("n_sh")).cast("long")).alias(
            "n_majority_dup"
        ),
    )


NOVELTY_NGRAM = 3


@query(
    "q_llm_ngram_novelty",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, string_split(text, ' ') AS t,
                   ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                       / 65536.0 AS u
            FROM documents
        ),
        train_sh AS (
            SELECT DISTINCT unnest({ngram_md5_sql(NOVELTY_NGRAM)}) AS h
            FROM d WHERE u < {SPLIT_TRAIN_FRAC}
        ),
        test_sh AS (
            SELECT doc_id, source, unnest({ngram_md5_sql(NOVELTY_NGRAM)}) AS h
            FROM d WHERE u >= {SPLIT_VAL_FRAC}
        ),
        per_doc AS (
            SELECT s.doc_id, s.source,
                   count(*) AS n_sh,
                   sum(CASE WHEN t.h IS NULL THEN 1 ELSE 0 END) AS n_novel
            FROM test_sh s LEFT JOIN train_sh t USING (h)
            GROUP BY s.doc_id, s.source
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                    AS n_test_docs,
               round(avg(n_novel * 1.0 / n_sh), 6)         AS avg_novelty,
               CAST(sum(CASE WHEN n_novel = n_sh
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_fully_novel
        FROM per_doc GROUP BY source
    """,
    description=f"Test-split {NOVELTY_NGRAM}-gram novelty vs train split (beyond-exact-dup independence)",
    tags=("llm", "split", "contamination"),
)
def q_llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of the test split is genuinely unseen: per test
    document, the fraction of its distinct token-3-grams that never
    occur in the train split (the q_llm_split_assign hash split, so
    the measurement matches the splitter it audits). Exact-dup leakage
    checks catch identical documents; this catches paraphrase-level
    overlap that inflates eval scores.

    Scale shape: the train shingle set is corpus-sized, so membership
    is a co-partitioned left join on the hash key (NOT a broadcast —
    contrast q_llm_contamination, whose benchmark side is tiny);
    novelty is counted from the join's null side. One shuffle per
    side, hashes only."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.split("text", " ").alias("toks"),
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
            ).cast("double")
            / F.lit(65536.0)
        ).alias("u"),
    )
    shingled = d.select(
        "doc_id",
        "source",
        "u",
        F.explode(F.expr(ngram_md5_expr(NOVELTY_NGRAM))).alias("h"),
    )
    train_sh = (
        shingled.filter(F.col("u") < SPLIT_TRAIN_FRAC)
        .select("h")
        .distinct()
        .withColumn("in_train", F.lit(True))
    )
    test_sh = shingled.filter(F.col("u") >= SPLIT_VAL_FRAC).select(
        "doc_id", "source", "h"
    )
    per_doc = (
        test_sh.join(train_sh, "h", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.col("in_train").isNull().cast("long")).alias("n_novel"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_test_docs"),
        F.round(F.avg(F.col("n_novel") / F.col("n_sh")), 6).alias(
            "avg_novelty"
        ),
        F.sum((F.col("n_novel") == F.col("n_sh")).cast("long")).alias(
            "n_fully_novel"
        ),
    )


# Safety blocklist: tokens that flag a document for review. The fixture
# vocabulary is synthetic query-plan words, so the list names three of
# them; a deployment swaps in its real lexicon (same plan shape at any
# list size up to the broadcast threshold).
SAFETY_BLOCKLIST = ("slow", "error", "drop")


@query(
    "q_llm_safety_wordlist",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
        ),
        scored AS (
            SELECT source,
                   len(list_filter(t, x -> x IN
                       ({", ".join(repr(w) for w in SAFETY_BLOCKLIST)})))
                       AS n_blocked
            FROM d
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                        AS n_docs,
               CAST(sum(CASE WHEN n_blocked > 0 THEN 1 ELSE 0 END)
                    AS BIGINT)                                 AS n_flagged,
               round(avg(CASE WHEN n_blocked > 0
                              THEN 1.0 ELSE 0.0 END), 6)       AS flag_rate,
               CAST(sum(n_blocked) AS BIGINT)                  AS tokens_blocked
        FROM scored GROUP BY source
    """,
    description="Safety wordlist filter: per-source flagged-doc rate + blocked-token totals (blocklist held as a literal, row-local membership)",
    tags=("llm", "text", "safety"),
)
def q_llm_safety_wordlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus safety gate: documents containing any blocklisted
    token are flagged, reported as per-source rates plus the total
    blocked-token volume (the review-queue sizing number). The
    blocklist rides INSIDE the expression as a literal array — at
    deployment size (thousands of terms) it becomes a broadcast join
    against an exploded token stream, same answer, and the row-local
    HOF form here is the plan you want while the list fits in a
    closure. No shuffle before the per-source agg; the filter is pure
    JVM codegen."""
    blocked = F.array(*[F.lit(w) for w in SAFETY_BLOCKLIST])
    d = load(spark, sf_dir, "documents").select(
        "source",
        F.size(
            F.filter(
                F.split("text", " "),
                lambda t: F.array_contains(blocked, t),
            )
        ).alias("n_blocked"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_blocked") > 0).cast("long")).alias("n_flagged"),
        F.round(F.avg((F.col("n_blocked") > 0).cast("double")), 6).alias(
            "flag_rate"
        ),
        F.sum("n_blocked").alias("tokens_blocked"),
    )


DOMAIN_CAP = 30  # max docs kept per source


@query(
    "q_llm_domain_cap",
    oracle=f"""
        WITH ranked AS (
            SELECT doc_id, source,
                   CAST(ceil(length(coalesce(text, '')) / 4.0) AS BIGINT)
                       AS toks,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT)                          AS n_docs,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP}
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_kept,
               CAST(sum(CASE WHEN rn > {DOMAIN_CAP}
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_dropped,
               CAST(sum(CASE WHEN rn <= {DOMAIN_CAP}
                             THEN toks ELSE 0 END) AS BIGINT)    AS tokens_kept
        FROM ranked GROUP BY source
    """,
    description=f"Domain frequency capping: keep at most {DOMAIN_CAP} docs per source in deterministic hash order, per-source funnel",
    tags=("llm", "sampling", "dedup"),
)
def q_llm_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency capping, the anti-head-domain step of corpus prep: no
    source contributes more than DOMAIN_CAP documents, the survivors
    chosen in md5(doc_id) order — a deterministic shuffle-stable
    "random" draw (the q_llm_split_assign idiom), so reprocessing
    keeps the same documents. Output is the per-source funnel the
    pipeline dashboard plots.

    Scale shape: one window partitioned by source (the capped entity —
    its cardinality bounds skew; a hot source with millions of docs is
    exactly what the cap exists to trim, and at 100 TB you pre-filter
    with an approximate per-source count before ranking only the
    sources over cap). The rank and the funnel agg share the source
    partitioning — one exchange total."""
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = load(spark, sf_dir, "documents").select(
        "source",
        F.ceil(F.length(F.coalesce("text", F.lit(""))) / 4.0)
        .cast("long")
        .alias("toks"),
        F.row_number().over(w).alias("rn"),
    )
    kept = F.col("rn") <= DOMAIN_CAP
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("long")).alias("n_kept"),
        F.sum((~kept).cast("long")).alias("n_dropped"),
        F.sum(F.when(kept, F.col("toks")).otherwise(0)).alias("tokens_kept"),
    )


# Snapshot diff: two corpus versions modeled as deterministic slices —
# v1 = doc_id % 10 != 9 plus doc_id % 10 == 3 with MUTATED text;
# v2 = the current table. Between versions: docs 9 (mod 10) were added,
# docs 3 (mod 10) changed content, the rest are unchanged.
SNAP_ADD_REM = 9
SNAP_CHG_REM = 3


@query(
    "q_llm_snapshot_diff",
    oracle=f"""
        WITH v2 AS (
            SELECT doc_id, source, md5(text) AS h FROM documents
        ),
        v1 AS (
            SELECT doc_id, source,
                   CASE WHEN doc_id % 10 = {SNAP_CHG_REM}
                        THEN md5(text || ' [stale]')
                        ELSE md5(text) END AS h
            FROM documents WHERE doc_id % 10 <> {SNAP_ADD_REM}
        )
        SELECT v2.source,
               CAST(count(*) AS BIGINT)                          AS n_docs_v2,
               CAST(sum(CASE WHEN v1.doc_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_added,
               CAST(sum(CASE WHEN v1.doc_id IS NOT NULL
                              AND v1.h <> v2.h
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_changed,
               CAST(sum(CASE WHEN v1.h = v2.h
                             THEN 1 ELSE 0 END) AS BIGINT)       AS n_unchanged
        FROM v2 LEFT JOIN v1 USING (doc_id)
        GROUP BY v2.source
    """,
    description="Corpus snapshot diff: added / content-changed / unchanged docs per source via content-hash join on the stable id",
    tags=("llm", "versioning", "dedup"),
)
def q_llm_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset versioning's core audit: diff two corpus snapshots by
    stable doc_id, classifying each current document as added (absent
    from v1), changed (present, content hash differs), or unchanged —
    what a training-data release sign-off reads before shipping v2.
    The fixture models v1 as a deterministic slice with mutated
    content for one residue class (inject-what-you-audit, the
    q_llm_split_leakage approach).

    Scale shape: both sides reduce to (doc_id, source, md5) BEFORE the
    join — 16-byte digests shuffle, text never does (the
    q_llm_passage_dedup rule); one co-partitioned join on the id, one
    per-source rollup. Removed-doc counting is the same join with the
    sides swapped; it is omitted here so every output row keys on the
    v2 corpus the release actually ships."""
    docs = load(spark, sf_dir, "documents")
    v2 = docs.select("doc_id", "source", F.md5("text").alias("h"))
    v1 = (
        docs.filter(F.col("doc_id") % 10 != SNAP_ADD_REM)
        .select(
            "doc_id",
            # presence marker: "added" means the ID is absent from v1 —
            # a NULL-text doc (md5 -> NULL) is still PRESENT, and using
            # the hash as the presence test misclassified it as added
            # (caught by the hostile-value tier). The oracle tests
            # v1.doc_id IS NULL for the same reason.
            F.lit(True).alias("in_v1"),
            F.when(
                F.col("doc_id") % 10 == SNAP_CHG_REM,
                F.md5(F.concat(F.col("text"), F.lit(" [stale]"))),
            )
            .otherwise(F.md5("text"))
            .alias("h_v1"),
        )
    )
    joined = v2.join(v1, "doc_id", "left")
    # src19's doc_ids are all ≡ 9 (mod 10) — the WHOLE source is new in
    # v2, so (h_v1 = h) is NULL on every row and a bare sum() would
    # return NULL where the oracle's CASE yields 0. Count the TRUE rows
    # with null-excluding predicate sums. A present doc whose hash is
    # NULL on both sides (NULL text) lands in NONE of the three change
    # classes — mirroring the oracle's three-valued CASE logic.
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_v2"),
        F.sum(F.col("in_v1").isNull().cast("long")).alias("n_added"),
        F.sum(
            (F.col("h_v1").isNotNull() & (F.col("h_v1") != F.col("h")))
            .cast("long")
        ).alias("n_changed"),
        F.sum(
            (F.col("h_v1").isNotNull() & (F.col("h_v1") == F.col("h")))
            .cast("long")
        ).alias("n_unchanged"),
    )
