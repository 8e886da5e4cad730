"""Text-analysis operators for LLM data pipelines (SURVEY.md §2.10):
token counting, quality scoring, language ID, TF-IDF, fingerprinting.

Everything here is built from JVM-side expressions (split / HOFs /
regexp / md5) — no Python UDFs — so the whole family rides whole-stage
codegen and scales linearly with document count. Per-document work is
O(doc length); nothing shuffles except the declared aggregations.

Tokenization contract: documents.text is single-space-separated tokens,
so ``split(text, ' ')`` is exact on the fixture; the regex token count
shows the robust variant for real corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load
from .contamination import ngram_md5_expr, ngram_md5_sql

# Tiny deterministic language profiles: marker tokens a real n-gram
# language identifier would learn from training text. On the synthetic
# fixture every document draws from one English-ish vocabulary, so the
# interesting (and tested) part is the scoring machinery, not accuracy.
LANG_MARKERS = {
    "en": ("the", "a", "and", "of"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "los", "de"),
    "fr": ("le", "la", "les", "des"),
    "zh": (),  # ideographic languages are detected by script, not tokens
}

STOPWORDS = ("the", "a", "and", "of", "to", "in")


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


@query(
    "q_llm_text_stats",
    oracle="""
        SELECT doc_id,
               length(text)                                          AS chars,
               len(string_split(text, ' '))                          AS ws_tokens,
               len(regexp_extract_all(text, '[a-z0-9]+'))            AS re_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT)              AS bpe_est_tokens,
               len(list_distinct(string_split(text, ' ')))           AS vocab,
               round(length(replace(text, ' ', ''))
                     / len(string_split(text, ' ')), 6)              AS avg_token_len
        FROM documents
        WHERE doc_id % 3 = 0
    """,
    description="Token counting: whitespace, regex, BPE-estimate; vocab + avg token length",
    tags=("llm", "text"),
)
def q_llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    toks = _tokens()
    return docs.select(
        "doc_id",
        F.length("text").alias("chars"),
        F.size(toks).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[a-z0-9]+"), 0)).alias(
            "re_tokens"
        ),
        F.ceil(F.length("text") / 4.0).alias("bpe_est_tokens"),
        F.size(F.array_distinct(toks)).alias("vocab"),
        F.round(
            F.length(F.regexp_replace("text", " ", "")) / F.size(toks), 6
        ).alias("avg_token_len"),
    )


@query(
    "q_llm_quality",
    oracle=f"""
        WITH scored AS (
            SELECT source,
                   len(string_split(text, ' ')) AS n_tok,
                   len(list_distinct(string_split(text, ' ')))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)   AS ttr,
                   len(list_filter(string_split(text, ' '),
                                   t -> list_contains({list(STOPWORDS)!r}, t)))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)   AS stop_ratio,
                   CASE WHEN length(text) BETWEEN 100 AND 20000 THEN 1 ELSE 0 END
                       AS len_ok
            FROM documents
        )
        SELECT source,
               count(*)                                   AS n_docs,
               round(avg(ttr), 6)                         AS avg_ttr,
               round(avg(stop_ratio), 6)                  AS avg_stop_ratio,
               CAST(sum(CASE WHEN len_ok = 1 AND stop_ratio < 0.5
                             AND ttr > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS n_keep
        FROM scored
        GROUP BY source
    """,
    description="Quality scoring: type-token ratio, stopword ratio, length gate -> keep/drop",
    tags=("llm", "text", "quality"),
)
def q_llm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    scored = docs.select("source", *_quality_cols())
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("ttr"), 6).alias("avg_ttr"),
        F.round(F.avg("stop_ratio"), 6).alias("avg_stop_ratio"),
        F.sum(F.when(_quality_keep(), 1).otherwise(0)).alias("n_keep"),
    )


def _quality_cols():
    """The one definition of the per-doc quality scores (type-token
    ratio, stopword ratio, length gate) — shared by q_llm_quality (the
    report) and q_llm_corpus_prep (the funnel), so a threshold or
    stopword-list change cannot silently desynchronize the funnel's
    n_quality from the report's n_keep."""
    toks = _tokens()
    n_tok = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    return (
        (F.size(F.array_distinct(toks)) / n_tok).alias("ttr"),
        (
            F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n_tok
        ).alias("stop_ratio"),
        F.when(F.length("text").between(100, 20000), 1).otherwise(0).alias("len_ok"),
    )


def _quality_keep():
    """The keep/drop gate over _quality_cols outputs."""
    return (
        (F.col("len_ok") == 1)
        & (F.col("stop_ratio") < 0.5)
        & (F.col("ttr") > 0.05)
    )


def _lang_score_sql(lang: str) -> str:
    markers = LANG_MARKERS[lang]
    if not markers:
        # script detection: any CJK codepoint (literal range chars — the
        # \\u escape syntax differs between RE2 and Java regex)
        return "CASE WHEN regexp_matches(text, '[一-鿿]') THEN 1000 ELSE 0 END"
    return (
        f"len(list_filter(string_split(text, ' '), t -> list_contains({list(markers)!r}, t)))"
    )


@query(
    "q_llm_lang_id",
    oracle=f"""
        WITH scores AS (
            SELECT lang AS labeled,
                   {_lang_score_sql('en')} AS s_en,
                   {_lang_score_sql('de')} AS s_de,
                   {_lang_score_sql('es')} AS s_es,
                   {_lang_score_sql('fr')} AS s_fr,
                   {_lang_score_sql('zh')} AS s_zh
            FROM documents
        ),
        pred AS (
            -- zero evidence (no marker hit, no CJK script) predicts
            -- 'und', not whichever branch 0 == 0 matches first: the
            -- CASE ordering put every empty/whitespace/emoji-only doc
            -- in the zh cell as an artifact (review r6)
            SELECT labeled,
                   CASE WHEN coalesce(greatest(s_en, s_de, s_es, s_fr, s_zh), 0) = 0
                             THEN 'und'
                        WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = s_zh
                             THEN 'zh'
                        WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = s_en
                             THEN 'en'
                        WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = s_de
                             THEN 'de'
                        WHEN greatest(s_en, s_de, s_es, s_fr, s_zh) = s_es
                             THEN 'es'
                        ELSE 'fr'
                   END AS predicted
            FROM scores
        )
        SELECT labeled, predicted, count(*) AS n
        FROM pred
        GROUP BY 1, 2
    """,
    description="Language ID: marker-token + script heuristic, confusion counts vs labels",
    tags=("llm", "text", "langid"),
)
def q_llm_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = _tokens()

    def score(lang: str):
        markers = LANG_MARKERS[lang]
        if not markers:
            return (
                F.when(F.col("text").rlike("[一-鿿]"), 1000).otherwise(0)
            )
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scores = docs.select(
        F.col("lang").alias("labeled"),
        score("en").alias("s_en"),
        score("de").alias("s_de"),
        score("es").alias("s_es"),
        score("fr").alias("s_fr"),
        score("zh").alias("s_zh"),
    )
    best = F.greatest("s_en", "s_de", "s_es", "s_fr", "s_zh")
    # zero evidence -> 'und' (review r6): without the guard the zh
    # branch matched first on 0 == 0 and every empty/whitespace/
    # emoji-only doc landed in the zh confusion cell as an artifact
    pred = scores.select(
        "labeled",
        F.when(best.isNull() | (best == 0), "und")
        .when(best == F.col("s_zh"), "zh")
        .when(best == F.col("s_en"), "en")
        .when(best == F.col("s_de"), "de")
        .when(best == F.col("s_es"), "es")
        .otherwise("fr")
        .alias("predicted"),
    )
    return pred.groupBy("labeled", "predicted").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q_llm_tfidf",
    oracle="""
        WITH tf AS (
            SELECT doc_id, t.term, count(*) AS tf
            FROM documents, unnest(string_split(text, ' ')) AS t(term)
            GROUP BY doc_id, t.term
        ),
        df AS (
            SELECT term, count(*) AS df FROM tf GROUP BY term
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.term,
                   round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
            FROM tf JOIN df USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tfidf
        FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term ASC) AS rk
            FROM scored
        )
        WHERE rk <= 3 AND doc_id % 10 = 0
    """,
    description="TF-IDF term scoring: explode -> tf, df join, smoothed idf, top-3 terms/doc",
    tags=("llm", "text", "tfidf"),
)
def q_llm_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(_tokens()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n_docs stays inside the plan: a broadcast 1-row aggregate instead
    # of a driver-side count() action, so the whole query is one lazy
    # plan (no extra job per invocation).
    n = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") % 10 == 0))
        .select("doc_id", "term", "tfidf")
    )


@query(
    "q_llm_fingerprint",
    oracle="""
        WITH fp AS (
            SELECT doc_id, source,
                   md5(text) AS full_hash,
                   list_min(list_transform(range(1, length(text) - 3),
                                           i -> md5(substr(text, i, 5)))) AS min_shingle,
                   list_max(list_transform(range(1, length(text) - 3),
                                           i -> md5(substr(text, i, 5)))) AS max_shingle
            FROM documents
        )
        SELECT source,
               count(*)                          AS n_docs,
               count(DISTINCT full_hash)         AS n_unique,
               min(min_shingle)                  AS src_min_shingle,
               max(max_shingle)                  AS src_max_shingle
        FROM fp
        GROUP BY source
    """,
    description="Document fingerprinting: full-text md5 + min/max 5-gram shingle hash (winnowing bound)",
    tags=("llm", "text", "fingerprint"),
)
def q_llm_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # if-guard: texts shorter than one 5-gram must yield an EMPTY
    # shingle list (-> NULL array_min/max, skipped by the source
    # aggregate, matching DuckDB's empty range()); Spark's
    # sequence(1, 0) is the descending [1, 0] and would fabricate junk
    # hashes that poison the per-source min/max.
    shingle_hashes = F.when(
        F.length("text") >= 5,
        F.transform(
            F.sequence(F.lit(1), F.length("text") - 4),
            lambda i: F.md5(F.col("text").substr(i, F.lit(5))),
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    fp = docs.select(
        "source",
        F.md5("text").alias("full_hash"),
        F.array_min(shingle_hashes).alias("min_shingle"),
        F.array_max(shingle_hashes).alias("max_shingle"),
    )
    return fp.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("full_hash").alias("n_unique"),
        F.min("min_shingle").alias("src_min_shingle"),
        F.max("max_shingle").alias("src_max_shingle"),
    )


@query(
    "q_llm_corpus_prep",
    oracle=f"""
        WITH scored AS (
            SELECT doc_id, source, text,
                   md5(lower(trim(text))) AS h,
                   len(list_distinct(string_split(text, ' ')))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)  AS ttr,
                   len(list_filter(string_split(text, ' '),
                                   t -> list_contains({list(STOPWORDS)!r}, t)))
                       / CAST(len(string_split(text, ' ')) AS DOUBLE)  AS stop_ratio,
                   CASE WHEN length(text) BETWEEN 100 AND 20000
                        THEN 1 ELSE 0 END                              AS len_ok
            FROM documents
        ),
        quality AS (
            SELECT * FROM scored
            WHERE len_ok = 1 AND stop_ratio < 0.5 AND ttr > 0.05
        ),
        uniq AS (
            SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
            FROM quality
        )
        SELECT sc.source,
               sc.n_raw,
               CAST(coalesce(q.n_quality, 0) AS BIGINT)     AS n_quality,
               CAST(coalesce(u.n_unique, 0) AS BIGINT)      AS n_unique,
               CAST(coalesce(u.tokens_total, 0) AS BIGINT)  AS tokens_total
        FROM (SELECT source, count(*) AS n_raw FROM scored GROUP BY source) sc
        LEFT JOIN (SELECT source, count(*) AS n_quality
                   FROM quality GROUP BY source) q USING (source)
        LEFT JOIN (SELECT source, count(*) AS n_unique,
                          sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
                              AS tokens_total
                   FROM uniq WHERE rn = 1 GROUP BY source) u USING (source)
    """,
    description="Corpus-prep funnel: quality gates -> exact dedup (first doc per hash) -> per-source kept-docs + token budget",
    tags=("llm", "text", "pipeline", "dedup"),
)
def q_llm_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep funnel as ONE lazy plan: score
    every document (JVM expressions only), gate on quality, keep the
    first document per content hash (global dedup — a duplicate in a
    second source is dropped there), and report the per-source funnel
    with the surviving token budget.

    Scale shape: one scan feeds everything; the dedup window shuffles
    on the content hash (uniformly distributed by construction — no
    skew); the three per-source aggregates are map-side combined and
    joined broadcast (source cardinality is tiny). No Python in the
    plan anywhere.
    """
    from pyspark.sql.window import Window

    docs = load(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
        *_quality_cols(),
    )
    quality = scored.filter(_quality_keep())
    uniq = quality.withColumn(
        "rn", F.row_number().over(Window.partitionBy("h").orderBy("doc_id"))
    ).filter(F.col("rn") == 1)

    raw_agg = scored.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    q_agg = quality.groupBy("source").agg(F.count(F.lit(1)).alias("n_quality"))
    u_agg = uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.ceil(F.length("text") / 4.0)).alias("tokens_total"),
    )
    return (
        raw_agg.join(F.broadcast(q_agg), "source", "left")
        .join(F.broadcast(u_agg), "source", "left")
        .select(
            "source",
            "n_raw",
            F.coalesce("n_quality", F.lit(0)).alias("n_quality"),
            F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
            F.coalesce("tokens_total", F.lit(0)).alias("tokens_total"),
        )
    )


# PII patterns kept to the Java-regex / RE2 common subset so the DuckDB
# oracle applies the exact same automaton.
EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"
IDTAG_RE = r"ID-[0-9]+"


@query(
    "q_llm_pii_redact",
    oracle=f"""
        WITH pii AS (
            -- coalesce: a NULL document redacts as an empty one. Spark
            -- concat NULLS the whole result on any NULL operand where
            -- DuckDB concat skips NULLs — without the coalesce the two
            -- engines disagree on every NULL-text row.
            SELECT doc_id, source,
                   concat(substring(coalesce(text, ''), 1, 80),
                          ' contact user', CAST(doc_id AS VARCHAR),
                          '@example.com or +1-555-',
                          lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                          ' ref ID-', CAST(doc_id AS VARCHAR)) AS pii_text
            FROM documents
            WHERE doc_id % 13 = 0
        )
        SELECT doc_id, source,
               len(regexp_extract_all(pii_text, '{EMAIL_RE}'))  AS n_emails,
               len(regexp_extract_all(pii_text, '{PHONE_RE}'))  AS n_phones,
               len(regexp_extract_all(pii_text, '{IDTAG_RE}'))  AS n_ids,
               regexp_replace(regexp_replace(regexp_replace(pii_text,
                   '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
                   '{IDTAG_RE}', '<ID>', 'g')                   AS redacted
        FROM pii
    """,
    description="PII scrubbing: count + redact emails/phones/id-tags via chained regexp_replace (JVM-only)",
    tags=("llm", "text", "pii"),
)
def q_llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction is a per-row pure function — chained `regexp_replace`
    rides whole-stage codegen, scales linearly, and never shuffles. The
    fixture text contains no real PII, so deterministic synthetic PII
    (derived from doc_id) is appended first; the oracle builds the same
    string and must produce the identical redaction.

    At 100 TB this is the shape you want: no UDF, no dictionary
    broadcast, patterns compiled once per task. Real pipelines extend
    the pattern list (SSNs, credit cards, street addresses) without
    changing the plan."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 13 == 0)
    did = F.col("doc_id").cast("string")
    pii = docs.select(
        "doc_id",
        "source",
        F.concat(
            # NULL text redacts as empty text (see oracle note: Spark
            # concat null-propagates, DuckDB concat skips NULLs).
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80),
            F.lit(" contact user"),
            did,
            F.lit("@example.com or +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ref ID-"),
            did,
        ).alias("pii_text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("pii_text", EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        IDTAG_RE,
        "<ID>",
    )
    return pii.select(
        "doc_id",
        "source",
        F.regexp_count("pii_text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("pii_text", F.lit(PHONE_RE)).alias("n_phones"),
        F.regexp_count("pii_text", F.lit(IDTAG_RE)).alias("n_ids"),
        redacted.alias("redacted"),
    )


URL_HOST_RE = r"https?://([a-z0-9.-]+)/"


@query(
    "q_llm_domain_stats",
    oracle=f"""
        WITH crawled AS (
            SELECT doc_id, text,
                   'https://' || source || '.example.com/docs/'
                               || CAST(doc_id AS VARCHAR) AS url
            FROM documents
        )
        SELECT regexp_extract(url, '{URL_HOST_RE}', 1)        AS domain,
               count(*)                                        AS n_docs,
               CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT))
                    AS BIGINT)                                 AS tokens_total,
               round(avg(length(text)), 4)                     AS avg_chars,
               min(doc_id)                                     AS first_doc
        FROM crawled
        GROUP BY 1
    """,
    description="Per-domain crawl curation stats: host extraction from URL + per-domain doc/token aggregates",
    tags=("llm", "text", "crawl"),
)
def q_llm_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl curation starts with per-domain statistics (doc counts,
    token budgets, quality drift) to set domain sampling weights. The
    fixture has no URL column, so a deterministic URL is synthesized
    from (source, doc_id); the host extraction is a shared-subset
    regexp (Spark `parse_url` would also work but has no DuckDB
    mirror). Pure JVM expressions, one aggregation shuffle keyed by
    domain — domain skew (one giant host) is the known risk, handled
    the same way as any hot groupBy key (AQE or pre-salting)."""
    docs = load(spark, sf_dir, "documents")
    crawled = docs.select(
        "doc_id",
        "text",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    return (
        crawled.select(
            F.regexp_extract("url", URL_HOST_RE, 1).alias("domain"),
            "doc_id",
            "text",
        )
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.ceil(F.length("text") / 4.0)).alias("tokens_total"),
            F.round(F.avg(F.length("text")), 4).alias("avg_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


MIX_TARGET_FRACTION = 0.3  # expected overall sample share


@query(
    "q_llm_mix_sample",
    oracle=f"""
        WITH d AS (
            SELECT source, doc_id,
                   CAST(ceil(length(text) / 4.0) AS BIGINT) AS toks
            FROM documents
        ),
        c AS (SELECT source, count(*) AS n_docs FROM d GROUP BY source),
        r AS (
            SELECT source, n_docs,
                   least(1.0, {MIX_TARGET_FRACTION}
                              * CAST(sum(n_docs) OVER () AS DOUBLE)
                              / sum(sqrt(CAST(n_docs AS DOUBLE))) OVER ()
                              / sqrt(CAST(n_docs AS DOUBLE))) AS rate
            FROM c
        ),
        tagged AS (
            SELECT d.source, toks, rate,
                   CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
                             / 65536.0 < rate
                        THEN 1 ELSE 0 END AS keep
            FROM d JOIN r USING (source)
        )
        SELECT source,
               CAST(count(*) AS BIGINT)            AS n_docs,
               round(max(rate), 6)                 AS rate,
               CAST(sum(keep) AS BIGINT)           AS n_sampled,
               CAST(sum(keep * toks) AS BIGINT)    AS tokens_sampled
        FROM tagged
        GROUP BY source
    """,
    description="Corpus mixture sampling: sqrt-weighted per-source rates, deterministic hash keep",
    tags=("llm", "sample", "mixing"),
)
def q_llm_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing for training corpora: down-weight abundant sources
    with square-root scaling (rate_s ∝ sqrt(n_s)/n_s, normalized so the
    expected overall sample is ``MIX_TARGET_FRACTION`` of the corpus,
    capped at 1). The rates are DATA-DRIVEN — a per-source count
    aggregate plus a 1-row total, composed lazily via crossJoin exactly
    like q_agg_histogram's bounds, never a driver-side collect — and
    membership is the md5-threshold trick from q_sample_hash, so the
    sampled set is reproducible on any cluster layout and bit-equal in
    the DuckDB oracle.

    Scale shape: one narrow counting pass (source column only, pruned
    at the scan) builds the 20-row rate table; one full pass joins the
    broadcast rates on and aggregates keep flags — the rate subtree is
    referenced ONCE, so nothing is recomputed, and the only wide
    shuffle is the final per-source aggregation after map-side
    combine. At 100 TB: two scans (one column-pruned), one broadcast,
    one shuffle of |sources| rows."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.ceil(F.length("text") / 4.0).alias("toks"),
    )
    c = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    # Totals as a global window over the already-tiny per-source counts:
    # referencing a separate 1-row aggregate would re-execute the count
    # subtree (Catalyst does not share common subplans) — the window
    # keeps the narrow scan single-pass at any corpus size, at the cost
    # of one |sources|-row single-partition exchange.
    wall = Window.partitionBy()
    r = c.select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            F.lit(MIX_TARGET_FRACTION)
            * F.sum("n_docs").over(wall).cast("double")
            / F.sum(F.sqrt(F.col("n_docs").cast("double"))).over(wall)
            / F.sqrt(F.col("n_docs").cast("double")),
        ).alias("rate"),
    )
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("double") / F.lit(65536.0)
    tagged = d.join(F.broadcast(r.select("source", "rate")), "source").withColumn(
        "keep", (u < F.col("rate")).cast("long")
    )
    return tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.max("rate"), 6).alias("rate"),
        F.sum("keep").alias("n_sampled"),
        F.sum(F.col("keep") * F.col("toks")).alias("tokens_sampled"),
    )


BOILER_NGRAM = 6
BOILER_MIN_DF = 2  # fixture-calibrated; real corpora use a DF fraction (e.g. 0.1%)


@query(
    "q_llm_boilerplate",
    oracle=f"""
        WITH src AS (
            -- coalesce: a NULL document shingles as an empty one (one
            -- ''-token shingle), rather than a NULL token list whose
            -- unnest/explode the engines disagree on.
            SELECT doc_id, source, coalesce(text, '') AS text FROM documents
        ),
        sh AS (
            SELECT doc_id, source,
                   unnest({ngram_md5_sql(BOILER_NGRAM, "string_split(text, ' ')")})                  AS h
            FROM src
        ),
        hot AS (
            SELECT h FROM sh GROUP BY h
            HAVING count(DISTINCT doc_id) >= {BOILER_MIN_DF}
        ),
        per_doc AS (
            SELECT s.doc_id, s.source,
                   count(*)                                        AS n_shingles,
                   count(*) FILTER (WHERE hot.h IS NOT NULL)       AS n_boiler
            FROM sh s LEFT JOIN hot ON s.h = hot.h
            GROUP BY s.doc_id, s.source
        )
        SELECT source,
               count(*)                                            AS n_docs,
               CAST(sum(CASE WHEN n_boiler > 0 THEN 1 ELSE 0 END)
                    AS BIGINT)                                     AS n_affected,
               round(avg(n_boiler / CAST(n_shingles AS DOUBLE)), 6) AS avg_boiler_frac
        FROM per_doc
        GROUP BY source
    """,
    description="Boilerplate detection: corpus-frequent 6-grams flagged, per-source affected-doc share",
    tags=("llm", "text", "quality"),
)
def q_llm_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style boilerplate detection: a token 6-gram occurring in many
    documents (cookie banners, license headers, nav text) is
    boilerplate; each document reports what fraction of its shingles
    are boilerplate, rolled up per source.

    Two passes over the shingle stream, both scale-shaped: (1) shingle
    document-frequency is a groupBy on the hash with the HAVING filter
    applied BEFORE anything joins back — the surviving hot set is small
    by construction (high-DF shingles are rare), so (2) the per-doc
    scoring join broadcasts it. A production pass would then strip the
    flagged spans; the detection plumbing is identical."""
    docs = load(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        "source",
        # NULL text -> [''] like an empty document (oracle coalesces)
        F.split(F.coalesce(F.col("text"), F.lit("")), " ").alias("toks"),
    ).select(
        "doc_id",
        "source",
        # shared template with q_llm_contamination (ngram_md5_expr):
        # one definition of the too-short-guard shingle semantics
        F.explode(F.expr(ngram_md5_expr(BOILER_NGRAM))).alias("h"),
    )
    hot = (
        # (doc_id, h) is unique by construction (array_distinct within
        # each doc), so plain count == count(DISTINCT doc_id) — skips
        # the distinct-aggregate expansion and keeps the DF count a
        # cheap map-side-partial sum.
        sh.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= BOILER_MIN_DF)
        .select("h", F.lit(True).alias("is_hot"))
    )
    per_doc = (
        sh.join(F.broadcast(hot), "h", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("is_hot").alias("n_boiler"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_boiler") > 0).cast("long")).alias("n_affected"),
        F.round(
            F.avg(F.col("n_boiler") / F.col("n_shingles").cast("double")), 6
        ).alias("avg_boiler_frac"),
    )


VOCAB_SIZE = 256


@query(
    "q_llm_repetition",
    oracle="""
        WITH d AS (
            SELECT doc_id, string_split(text, ' ') AS t
            FROM documents WHERE doc_id % 3 = 1
        ),
        uni AS (
            SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(t) AS tok FROM d)
            GROUP BY doc_id, tok
        ),
        unia AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
                   max(c) AS top_tok_c
            FROM uni GROUP BY doc_id
        ),
        bg AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(t)),
                                         i -> t[i] || ' ' || t[i + 1])) AS g
            FROM d
        ),
        bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
        bga AS (
            SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                   max(c) AS top_bg_c,
                   CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
                       AS dup_bg_c
            FROM bgc GROUP BY doc_id
        )
        SELECT u.doc_id, n_tok,
               round(top_tok_c / CAST(n_tok AS DOUBLE), 6)     AS top_token_frac,
               n_bigrams,
               round(top_bg_c / CAST(n_bigrams AS DOUBLE), 6)  AS top_bigram_frac,
               round(dup_bg_c / CAST(n_bigrams AS DOUBLE), 6)  AS dup_bigram_frac,
               CASE WHEN top_tok_c / CAST(n_tok AS DOUBLE) < 0.2
                     AND dup_bg_c / CAST(n_bigrams AS DOUBLE) < 0.5
                    THEN 1 ELSE 0 END                          AS keep
        FROM unia u JOIN bga b USING (doc_id)
    """,
    description="Repetition signals (Gopher-style): top-token / top-bigram / duplicate-bigram fractions -> keep gate",
    tags=("llm", "text", "quality"),
)
def q_llm_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals, the Gopher/MassiveText family:
    fraction of mass in the most common token, in the most common
    bigram, and in bigrams occurring more than once, gated into a keep
    flag. Machine-generated and boilerplate text scores high on all
    three; the thresholds (0.2 / 0.5) are the published ballpark.

    Shape: explode n-grams -> per-(doc, gram) count -> per-doc
    aggregate. Both groupBys partial-aggregate map-side, and the keys
    are (doc_id, gram) — high cardinality, no skew — so the shuffles
    stay balanced at corpus scale. No Python anywhere.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 1)
    base = docs.select("doc_id", _tokens().alias("t"))

    uni = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tok"), F.max("c").alias("top_tok_c"))
    )
    bg = (
        base.select(
            "doc_id",
            F.explode(
                # if-guard: sequence(1, 0) is descending in Spark (not
                # empty like DuckDB range) and element_at would crash on
                # single-token docs — see dedup.SHINGLES_EXPR.
                F.expr(
                    "if(size(t) >= 2,"
                    " transform(sequence(1, size(t) - 1),"
                    " i -> concat(element_at(t, i), ' ', element_at(t, i + 1))),"
                    " array())"
                )
            ).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.max("c").alias("top_bg_c"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
                "dup_bg_c"
            ),
        )
    )
    top_tok_frac = F.col("top_tok_c") / F.col("n_tok").cast("double")
    dup_bg_frac = F.col("dup_bg_c") / F.col("n_bigrams").cast("double")
    return uni.join(bg, "doc_id").select(
        "doc_id",
        "n_tok",
        F.round(top_tok_frac, 6).alias("top_token_frac"),
        "n_bigrams",
        F.round(F.col("top_bg_c") / F.col("n_bigrams").cast("double"), 6).alias(
            "top_bigram_frac"
        ),
        F.round(dup_bg_frac, 6).alias("dup_bigram_frac"),
        F.when((top_tok_frac < 0.2) & (dup_bg_frac < 0.5), 1)
        .otherwise(0)
        .alias("keep"),
    )


@query(
    "q_llm_tokenize_vocab",
    oracle=f"""
        WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        tok AS (
            SELECT doc_id,
                   unnest(range(1, len(t) + 1)) AS pos,
                   unnest(t)                    AS tok
            FROM d
        ),
        vc AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
        vocab AS (
            SELECT tok, row_number() OVER (ORDER BY c DESC, tok) AS tok_id
            FROM vc
            QUALIFY tok_id <= {VOCAB_SIZE}
        ),
        j AS (
            SELECT t.doc_id, t.pos, v.tok_id
            FROM tok t LEFT JOIN vocab v USING (tok)
        )
        SELECT doc_id,
               CAST(count(*) AS BIGINT)  AS n_tok,
               CAST(sum(CASE WHEN tok_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                                         AS n_oov,
               round(avg(CASE WHEN tok_id IS NULL THEN 1.0 ELSE 0.0 END), 6)
                                         AS oov_rate,
               CAST(sum(coalesce(tok_id, 0) * pos) AS BIGINT)
                                         AS id_checksum
        FROM j GROUP BY doc_id
    """,
    description="Vocabulary tokenization: corpus top-256 vocab, broadcast id lookup, per-doc OOV rate + position-weighted checksum",
    tags=("llm", "text", "tokenize"),
)
def q_llm_tokenize_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-constrained tokenization: map every token to an id
    from a deterministic top-N corpus vocabulary (count desc, token
    asc), left-joined so out-of-vocabulary tokens surface as an OOV
    rate; a position-weighted id checksum makes the parity check
    order-sensitive, not just multiset-equal.

    In production the vocab is a trained tokenizer's table — a static
    small relation. Here it is derived from the corpus itself with a
    top-k (TakeOrdered, no full sort) + row_number over just
    VOCAB_SIZE rows, then **broadcast** into the token join: the corpus
    side never shuffles for the lookup, which is the only join strategy
    that survives a 100 TB tokenize pass.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")

    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(VOCAB_SIZE)
        .select(
            "tok",
            F.row_number()
            .over(Window.orderBy(F.desc("c"), F.asc("tok")))
            .alias("tok_id"),
        )
    )
    oov = F.when(F.col("tok_id").isNull(), 1).otherwise(0)
    return (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tok"),
            F.sum(oov).alias("n_oov"),
            F.round(F.avg(oov.cast("double")), 6).alias("oov_rate"),
            F.sum(F.coalesce("tok_id", F.lit(0)) * F.col("pos")).alias(
                "id_checksum"
            ),
        )
    )


BPE_MERGES = 5
BPE_SEP = "~"  # absent from the fixture charset (asserted by the oracle shape)


def _bpe_oracle(n_merges: int) -> str:
    """Chained-CTE DuckDB mirror of the BPE trainer: each round counts
    adjacent symbol pairs, picks the top pair (count desc, pair asc),
    and applies the merge via sentinel-wrapped string replace."""
    parts = [
        f"""WITH w0 AS (
            SELECT '{BPE_SEP}' || array_to_string(
                       list_transform(range(1, length(w) + 1), i -> w[i]),
                       '{BPE_SEP}{BPE_SEP}') || '{BPE_SEP}' AS s,
                   CAST(count(*) AS BIGINT) AS freq
            FROM (SELECT unnest(string_split(text, ' ')) AS w
                  FROM documents WHERE doc_id % 5 = 0)
            WHERE length(w) BETWEEN 3 AND 10
            GROUP BY 1
        )"""
    ]
    for r in range(1, n_merges + 1):
        parts.append(f""",
        p{r} AS (
            SELECT sym[i] AS a, sym[i + 1] AS b,
                   CAST(sum(freq) AS BIGINT) AS cnt
            FROM (
                SELECT sym, freq, unnest(range(1, len(sym))) AS i
                FROM (
                    SELECT string_split(substring(s, 2, length(s) - 2),
                                        '{BPE_SEP}{BPE_SEP}') AS sym, freq
                    FROM w{r - 1}
                ) WHERE len(sym) >= 2
            )
            GROUP BY 1, 2
        ),
        t{r} AS (SELECT a, b, cnt FROM p{r} ORDER BY cnt DESC, a, b LIMIT 1),
        w{r} AS (
            SELECT replace(s, '{BPE_SEP}' || a || '{BPE_SEP}{BPE_SEP}' || b || '{BPE_SEP}',
                           '{BPE_SEP}' || a || b || '{BPE_SEP}') AS s, freq
            FROM w{r - 1}, t{r}
        )""")
    selects = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, a, b, a || b AS merged, cnt FROM t{r}"
        for r in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n" + selects


@query(
    "q_llm_bpe_train",
    oracle=_bpe_oracle(BPE_MERGES),
    description="BPE tokenizer training: N pair-merge rounds over the word-frequency table as one lazy plan",
    tags=("llm", "text", "tokenize", "bpe"),
)
def q_llm_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding tokenizer training — the real algorithm, not
    a sketch: start from the per-word character sequences weighted by
    corpus frequency, and per round (a) count adjacent symbol pairs,
    (b) pick the most frequent pair (count desc, pair asc tiebreak),
    (c) merge its occurrences. Returns the learned merge table, the
    artifact a tokenizer ships.

    Control flow is the k-means/CC driver round-trip, NOT one lazy
    plan: each round collects exactly ONE row (the winning pair) and
    folds it into the next round's merge as a literal, with
    `localCheckpoint` truncating the word-table lineage per round. The
    earlier all-lazy formulation (round r's 1-row top crossJoin-
    broadcast into round r+1) re-derived every prior round inside each
    later one — the final plan held 31 corpus scans and 88 exchanges
    for 5 merges, O(N^2) recomputation that no exchange-reuse rule
    collapsed. With checkpointing, the corpus-sized word aggregation
    runs ONCE and each round touches only the vocab-sized table: one
    pair-count shuffle + one scalar to the driver per round, which is
    how an iterative trainer should drive a 100 TB corpus. The merge
    step is a sentinel-wrapped string replace — `~a~~b~` → `~ab~` —
    which both engines apply left-to-right non-overlapping, exactly
    BPE's merge semantics.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    w = docs.select(F.explode(_tokens()).alias("w")).filter(
        F.length("w").between(3, 10)
    )
    words = w.groupBy("w").agg(F.count("*").alias("freq")).select(
        F.concat(
            F.lit(BPE_SEP),
            F.expr(
                "array_join(transform(sequence(1, length(w)), "
                f"i -> substring(w, i, 1)), '{BPE_SEP}{BPE_SEP}')"
            ),
            F.lit(BPE_SEP),
        ).alias("s"),
        "freq",
    )
    words = words.localCheckpoint(eager=False)
    merge_rows = []
    for r in range(1, BPE_MERGES + 1):
        sy = words.select(
            F.expr(
                f"split(substring(s, 2, length(s) - 2), '{BPE_SEP}{BPE_SEP}')"
            ).alias("sym"),
            "freq",
        ).filter(F.expr("size(sym) >= 2"))
        pr = sy.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(sym) - 1), i -> "
                    "struct(element_at(sym, i) AS a, element_at(sym, i + 1) AS b))"
                )
            ).alias("p"),
            "freq",
        )
        top = (
            pr.select("p.a", "p.b", "freq")
            .groupBy("a", "b")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .collect()  # ONE row: the control-plane round-trip
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], top[0]["cnt"]
        merge_rows.append((r, a, b, a + b, cnt))
        # Literal fold (no crossJoin, no SQL-string splicing of data
        # values) + lineage truncation: next round starts from the
        # materialized vocab table, never from the corpus scan.
        words = words.select(
            F.replace(
                F.col("s"),
                F.lit(f"{BPE_SEP}{a}{BPE_SEP}{BPE_SEP}{b}{BPE_SEP}"),
                F.lit(f"{BPE_SEP}{a}{b}{BPE_SEP}"),
            ).alias("s"),
            "freq",
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merge_rows, "merge_rank int, a string, b string, merged string, cnt bigint"
    )


@query(
    "q_llm_unigram_logprob",
    oracle="""
        WITH toks AS (
            SELECT doc_id, source, t
            FROM (SELECT doc_id, source,
                         unnest(string_split(trim(text), ' ')) AS t
                  FROM documents)
            WHERE t <> ''
        ),
        freq AS (SELECT t, count(*) AS c FROM toks GROUP BY t),
        tot AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM freq),
        doc AS (
            SELECT doc_id, source, avg(-ln(c / n)) AS nll
            FROM toks JOIN freq USING (t) CROSS JOIN tot
            GROUP BY doc_id, source
        )
        SELECT source,
               count(*)             AS n_docs,
               round(avg(nll), 6)   AS avg_nll,
               round(min(nll), 6)   AS min_nll,
               round(max(nll), 6)   AS max_nll
        FROM doc
        GROUP BY source
    """,
    description="Perplexity-proxy quality signal: corpus-fit unigram LM, per-doc mean negative log-likelihood, per-source distribution",
    tags=("llm", "text", "quality", "lm"),
)
def q_llm_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic corpus-quality signal (the CCNet recipe uses a
    KenLM; the unigram LM is its relational skeleton): fit token
    frequencies on the corpus itself, score every document by its mean
    negative log-likelihood, and report the per-source distribution —
    high-NLL docs are gibberish/rare-token soup, low-NLL docs are
    boilerplate-ish; the filter thresholds come from these per-source
    stats. Documents with no tokens (NULL/empty/whitespace-only) carry
    no signal and are out of scope on both sides.

    Tokens are case-SENSITIVE by design: JVM and DuckDB lower() apply
    different locale-sensitive case rules (Turkish dotted İ -> 'i' +
    combining dot vs plain 'i'; Greek capital sigma -> final-form
    sigma under Java's context rule, plain sigma under DuckDB's), so
    cross-doc token frequencies — the one thing this op aggregates
    ACROSS documents — would silently diverge per engine on
    multilingual text (measured on the unicode differential tier).
    Production case-folds with ONE deterministic normalizer upstream
    of the engine; hash-count ops (q_llm_exact_dedup) keep lower()
    safely because they only compare counts within one engine.

    Scale shape: ONE explode of the corpus into (doc, token) rows,
    a map-side-combined frequency aggregation over it, and the scoring
    join back. The frequency table is the corpus's unigram VOCABULARY
    (Heaps-law sublinear in corpus size — tens of millions of types
    even at 100 TB), so it is explicitly broadcast: the token stream
    never shuffles for scoring, and the Zipf-hot tokens ("the") that
    would skew a shuffle join are irrelevant under a map-side hash
    probe. If a tokenizer ever blew the vocab past broadcast range,
    the fallback is the shuffle join + AQE skew handling. The 1-row
    corpus total rides the same broadcast pattern as q_llm_tfidf's
    doc count."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            "source",
            F.explode(F.split(F.trim("text"), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = freq.agg(F.sum("c").cast("double").alias("n"))
    doc = (
        toks.join(F.broadcast(freq), "t")
        .join(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(F.avg(-F.log(F.col("c") / F.col("n"))).alias("nll"))
    )
    return doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


_URL_SCHEME_HOST_RE = r"^[a-z]+://([^/?#]+)"
_URL_PATH_RE = r"^[a-z]+://[^/?#]+([^?#]*)"
_URL_QUERY_RE = r"\?([^#]*)"


@query(
    "q_llm_url_normalize",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id,
                   'http' || CASE WHEN doc_id % 2 = 0 THEN 's' ELSE '' END
                   || '://'
                   || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0 THEN upper(source) ELSE source END
                   || '.example.com/docs/' || CAST(doc_id % 50 AS VARCHAR)
                   || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN '?utm_source=feed&page=' || CAST(doc_id % 3 AS VARCHAR) || '&ref=tw'
                           WHEN doc_id % 4 = 1
                           THEN '?page=' || CAST(doc_id % 3 AS VARCHAR)
                           ELSE '' END
                   || CASE WHEN doc_id % 11 = 0 THEN '#sec' ELSE '' END AS url
            FROM documents
        ),
        canon AS (
            SELECT doc_id, url,
                   'https://'
                   || regexp_replace(lower(regexp_extract(url, '{_URL_SCHEME_HOST_RE}', 1)), '^www\\.', '')
                   || regexp_replace(regexp_extract(url, '{_URL_PATH_RE}', 1), '/$', '')
                   || CASE WHEN kept = '' THEN '' ELSE '?' || kept END AS canonical_url
            FROM (
                SELECT doc_id, url,
                       -- coalesce: DuckDB array_to_string([]) is NULL,
                       -- Spark array_join([]) is '' — fold to ''
                       coalesce(array_to_string(
                           list_filter(string_split(regexp_extract(url, '{_URL_QUERY_RE}', 1), '&'),
                                       x -> NOT (x LIKE 'utm_%' OR x LIKE 'ref=%') AND x <> ''),
                           '&'), '') AS kept
                FROM raw
            )
        )
        SELECT canonical_url,
               count(*)                      AS n_variants,
               CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw,
               min(doc_id)                   AS keep_doc_id
        FROM canon
        GROUP BY canonical_url
    """,
    description="URL canonicalization + URL-level dedup (scheme/case/www/tracking-param/fragment folding)",
    tags=("llm", "dedup", "url"),
)
def q_llm_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup is the first pass of every web-corpus pipeline
    (RefinedWeb/CCNet run it before any content hashing): fold the
    crawl-noise degrees of freedom — scheme, host case, ``www.``,
    trailing slash, tracking params, fragments — then keep one doc per
    canonical URL. The fixture has no URL column, so a deterministic
    messy URL is synthesized per doc (same convention as
    q_llm_domain_stats) with doc_id-driven variation in every noise
    dimension. All canonicalization is JVM-side regexp/HOF column math
    — component extraction by single-match regexp (immune to the
    replace-first-vs-all engine split), query-param filtering via
    split → array filter → rejoin. One aggregation shuffle keyed by
    canonical URL; at 100 TB this is the cheapest dedup tier (no
    shingling, no pairwise anything), and the keep rule (min doc_id)
    is the stable tie-break the later content tiers assume."""
    docs = load(spark, sf_dir, "documents")
    url = (
        F.concat(
            F.lit("http"),
            F.when(F.col("doc_id") % 2 == 0, F.lit("s")).otherwise(F.lit("")),
            F.lit("://"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.upper("source")).otherwise(
                F.col("source")
            ),
            F.lit(".example.com/docs/"),
            (F.col("doc_id") % 50).cast("string"),
            F.when(F.col("doc_id") % 7 == 0, F.lit("/")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit("?utm_source=feed&page="),
                    (F.col("doc_id") % 3).cast("string"),
                    F.lit("&ref=tw"),
                ),
            )
            .when(
                F.col("doc_id") % 4 == 1,
                F.concat(F.lit("?page="), (F.col("doc_id") % 3).cast("string")),
            )
            .otherwise(F.lit("")),
            F.when(F.col("doc_id") % 11 == 0, F.lit("#sec")).otherwise(F.lit("")),
        )
    ).alias("url")
    raw = docs.select("doc_id", url)
    kept = F.array_join(
        F.filter(
            F.split(F.regexp_extract("url", _URL_QUERY_RE, 1), "&"),
            lambda x: ~(x.startswith("utm_") | x.startswith("ref=")) & (x != ""),
        ),
        "&",
    )
    canon = raw.select(
        "doc_id",
        "url",
        F.concat(
            F.lit("https://"),
            F.regexp_replace(
                F.lower(F.regexp_extract("url", _URL_SCHEME_HOST_RE, 1)),
                r"^www\.",
                "",
            ),
            F.regexp_replace(
                F.regexp_extract("url", _URL_PATH_RE, 1), r"/$", ""
            ),
            F.when(kept == "", F.lit("")).otherwise(F.concat(F.lit("?"), kept)),
        ).alias("canonical_url"),
    )
    return canon.groupBy("canonical_url").agg(
        F.count(F.lit(1)).alias("n_variants"),
        F.countDistinct("url").alias("n_distinct_raw"),
        F.min("doc_id").alias("keep_doc_id"),
    )


PMI_MIN_COUNT = 3
PMI_TOP_K = 100


@query(
    "q_llm_pmi_bigrams",
    oracle=f"""
        WITH toks AS (
            SELECT string_split(text, ' ') AS t FROM documents
            WHERE text IS NOT NULL
        ),
        uni AS (
            SELECT w, count(*) AS c
            FROM (SELECT unnest(t) AS w FROM toks)
            GROUP BY 1
        ),
        bi AS (
            SELECT u.bg.w1 AS w1, u.bg.w2 AS w2, count(*) AS c_xy
            FROM (
                SELECT unnest(list_transform(
                           range(1, len(t)),
                           i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS bg
                FROM toks
                WHERE len(t) >= 2
            ) u
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni)    AS n_uni,
                   (SELECT CAST(sum(c_xy) AS BIGINT) FROM bi)  AS n_bi
        )
        SELECT w1, w2,
               CAST(c_xy AS BIGINT) AS c_xy,
               CAST(cx AS BIGINT)   AS c_x,
               CAST(cy AS BIGINT)   AS c_y,
               round(ln(CAST(c_xy AS DOUBLE) / (cx * cy)
                        * n_uni * n_uni / n_bi), 6) AS pmi
        FROM (
            SELECT bi.w1, bi.w2, bi.c_xy, ux.c AS cx, uy.c AS cy,
                   tot.n_uni, tot.n_bi
            FROM bi
            JOIN uni ux ON bi.w1 = ux.w
            JOIN uni uy ON bi.w2 = uy.w
            CROSS JOIN tot
            WHERE bi.c_xy >= {PMI_MIN_COUNT}
        )
        ORDER BY CAST(c_xy AS DOUBLE) / (cx * cy) DESC, w1 ASC, w2 ASC
        LIMIT {PMI_TOP_K}
    """,
    description="Collocation mining: top bigrams by pointwise mutual information",
    tags=("llm", "text", "pmi"),
)
def q_llm_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining over the corpus: pointwise mutual information
    for adjacent token bigrams, PMI = ln(P(xy) / (P(x)P(y))), the
    classic phrase-detection signal (word2vec's phrase pass, NLTK
    collocations) — rare-but-always-together pairs rank first.

    Determinism contract: the RANKING key is the exact IEEE double
    c_xy / (c_x * c_y) — integer inputs, one correctly-rounded
    division, bit-identical on both engines, and a monotone transform
    of PMI because the corpus totals are constant across rows — so the
    top-k cut can never flip on a libm ulp; only the DISPLAYED pmi
    runs through ln (rounded 6 dp, tie-broken (w1, w2)). Bigrams
    require >= 2 tokens (guarded identically on both sides: Spark
    sequence(1, n) with n <= 0 would COUNT DOWN and fabricate pairs);
    sub-threshold pairs (< {min_count}) are cut before any join.

    Scale shape: TWO aggregations over the exploded token stream
    (unigram + bigram counts), both map-side combined — bytes shuffled
    scale with vocabulary and distinct-bigram cardinality (Heaps-law
    sublinear), never corpus size. The corpus totals are derived from
    the already-aggregated count tables (1-row aggregates, crossJoin
    broadcast, the q_agg_histogram bounds pattern), and the two
    unigram rejoins broadcast the vocabulary. The final top-k is a
    TakeOrdered, never a global sort.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select(F.split("text", " ").alias("t"))

    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = (
        toks.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> struct(element_at(t, i) AS w1,"
                    "             element_at(t, i + 1) AS w2))"
                )
            ).alias("bg")
        )
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_xy"))
    )

    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_bi = bi.agg(F.sum("c_xy").alias("n_bi"))

    scored = (
        bi.filter(F.col("c_xy") >= PMI_MIN_COUNT)
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "cx")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "cy")), "w2")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
    )
    ratio = F.col("c_xy").cast("double") / (F.col("cx") * F.col("cy"))
    return (
        scored.select(
            "w1",
            "w2",
            "c_xy",
            F.col("cx").alias("c_x"),
            F.col("cy").alias("c_y"),
            F.round(
                F.log(
                    ratio * F.col("n_uni") * F.col("n_uni") / F.col("n_bi")
                ),
                6,
            ).alias("pmi"),
            ratio.alias("_r"),
        )
        .orderBy(F.col("_r").desc(), F.col("w1").asc(), F.col("w2").asc())
        .limit(PMI_TOP_K)
        .drop("_r")
    )


q_llm_pmi_bigrams.__doc__ = q_llm_pmi_bigrams.__doc__.format(
    min_count=PMI_MIN_COUNT
)


@query(
    "q_llm_entropy",
    oracle="""
        WITH tok_counts AS (
            SELECT doc_id, source, tok, count(*) AS c
            FROM (
                SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
                FROM documents
                WHERE text IS NOT NULL
            )
            GROUP BY 1, 2, 3
        ),
        doc_entropy AS (
            SELECT doc_id, source,
                   ln(CAST(sum(c) AS DOUBLE))
                     - sum(c * ln(CAST(c AS DOUBLE))) / sum(c) AS h
            FROM tok_counts
            GROUP BY 1, 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT)  AS n_docs,
               round(avg(h), 6)          AS avg_entropy,
               round(min(h), 6)          AS min_entropy,
               round(max(h), 6)          AS max_entropy
        FROM doc_entropy
        GROUP BY source
    """,
    description="Per-source token Shannon entropy distribution (gibberish / repetition detector)",
    tags=("llm", "text", "quality"),
)
def q_llm_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level Shannon entropy per document, aggregated per source
    — the quality signal that separates natural text (entropy near
    ln(vocab-per-doc)) from degenerate repetition (entropy near 0) and
    keyboard-mash gibberish (entropy near the uniform maximum). Uses
    the algebraic identity H = ln(n) - sum(c*ln c)/n so the per-doc
    reduction needs only the token counts, not the probabilities — one
    extra pass over counts, zero over raw tokens.

    Scale shape: two map-side-combined aggregations — (doc, token)
    counts (bytes shuffled ~ distinct per-doc vocab, not token
    stream), then per-doc entropy folding ~vocab rows per doc, then a
    tiny per-source rollup. No joins, no windows, no Python. The
    per-doc sum order differs between engines but the terms are O(10)
    magnitude over O(100) counts, so fp drift sits ~1e-14, far below
    the 6 dp rounding grid.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok_counts = (
        docs.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .groupBy("doc_id", "source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    doc_entropy = tok_counts.groupBy("doc_id", "source").agg(
        (
            F.log(F.sum("c").cast("double"))
            - F.sum(F.col("c") * F.log(F.col("c").cast("double"))) / F.sum("c")
        ).alias("h")
    )
    return doc_entropy.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("h"), 6).alias("avg_entropy"),
        F.round(F.min("h"), 6).alias("min_entropy"),
        F.round(F.max("h"), 6).alias("max_entropy"),
    )


FEATURE_HASH_DIMS = 64
FEATURE_HASH_SLICE = 7


@query(
    "q_llm_feature_hash",
    oracle=f"""
        SELECT doc_id,
               ('0x' || substring(md5(tok), 1, 4))::INT % {FEATURE_HASH_DIMS}
                   AS dim,
               CAST(count(*) AS BIGINT) AS n,
               round(count(*) / CAST(any_value(n_tok) AS DOUBLE), 6) AS tf
        FROM (
            SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
                   unnest(string_split(text, ' ')) AS tok
            FROM documents
            WHERE doc_id % {FEATURE_HASH_SLICE} = 0 AND text IS NOT NULL
        )
        GROUP BY 1, 2
    """,
    description="Feature hashing: fixed-width hashed bag-of-tokens vectors (fastText-style)",
    tags=("llm", "text", "features"),
)
def q_llm_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (fastText / Vowpal Wabbit style): project each
    document's bag of tokens into a FIXED {dims}-dimension space via a
    stable hash, emitting sparse (doc, dim, count, tf) rows — the
    input representation for a linear quality classifier that needs no
    vocabulary build and therefore no extra corpus pass. The hash is
    the md5-hex-prefix trick shared with q_llm_mix_sample, bit-equal
    across engines and cluster layouts (never hash(): JVM and DuckDB
    disagree). The tf denominator (doc token count) is computed
    row-locally BEFORE the explode and carried through, so
    normalization costs zero extra shuffles.

    Scale shape: explode -> ONE map-side-combined groupBy(doc, dim);
    output <= {dims} rows per document regardless of vocabulary, and
    collisions degrade gracefully (that is the point of the trick).
    The doc_id slice bounds fixture output volume only — the plan is
    the full-corpus plan, and at 100 TB the slice is simply dropped.
    """
    docs = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") % FEATURE_HASH_SLICE == 0) & F.col("text").isNotNull())
        .select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", F.size("t").alias("n_tok"), F.explode("t").alias("tok"))
    )
    dim = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
        % FEATURE_HASH_DIMS
    )
    return docs.groupBy("doc_id", dim.alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.count(F.lit(1)) / F.any_value(F.col("n_tok")).cast("double"), 6
        ).alias("tf"),
    )


q_llm_feature_hash.__doc__ = q_llm_feature_hash.__doc__.format(
    dims=FEATURE_HASH_DIMS
)


BIGRAM_LM_K = 0.5  # add-k smoothing mass


@query(
    "q_llm_bigram_lm",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id, source, string_split(text, ' ') AS t
            FROM documents
            WHERE text IS NOT NULL
        ),
        stream AS (
            SELECT doc_id, source, u.bg.w1 AS w1, u.bg.w2 AS w2
            FROM (
                SELECT doc_id, source,
                       unnest(list_transform(
                           range(1, len(t)),
                           i -> struct_pack(w1 := t[i], w2 := t[i + 1]))) AS bg
                FROM toks
                WHERE len(t) >= 2
            ) u
        ),
        uni AS (
            SELECT w, count(*) AS c
            FROM (SELECT unnest(t) AS w FROM toks)
            GROUP BY 1
        ),
        bi AS (
            SELECT w1, w2, count(*) AS c_xy FROM stream GROUP BY 1, 2
        ),
        vocab AS (SELECT CAST(count(*) AS DOUBLE) AS v FROM uni),
        doc_nll AS (
            SELECT s.doc_id, s.source,
                   avg(-ln((bi.c_xy + {BIGRAM_LM_K!r})
                           / (uni.c + {BIGRAM_LM_K!r} * vocab.v))) AS nll
            FROM stream s
            JOIN bi  ON s.w1 = bi.w1 AND s.w2 = bi.w2
            JOIN uni ON s.w1 = uni.w
            CROSS JOIN vocab
            GROUP BY 1, 2
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               round(avg(nll), 6)       AS avg_nll,
               round(min(nll), 6)       AS min_nll,
               round(max(nll), 6)       AS max_nll
        FROM doc_nll
        GROUP BY source
    """,
    description="CCNet-style bigram LM scoring: per-doc mean smoothed-NLL, per-source distribution",
    tags=("llm", "text", "quality", "lm"),
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The conditional step up from q_llm_unigram_logprob: a corpus-fit
    bigram language model P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k*V)
    with add-k smoothing, scoring every document by its mean bigram
    negative log-likelihood — repetitive/templated docs score low,
    shuffled-word salad scores high even when its unigram profile
    looks natural, which is precisely the failure mode the unigram
    signal cannot see.

    Scale shape: the bigram count table is Heaps-sublinear but NOT
    vocabulary-small, so the probe joins it on (w1, w2) as a hash
    shuffle (documented: at 100 TB this is the one wide join; the
    token stream and the count table co-partition on the bigram key).
    The unigram context counts broadcast; the vocabulary size V is a
    1-row broadcast. Smoothing means every observed bigram has
    c_xy >= 1 — no missing-key branch, the join is inner by
    construction (every stream bigram exists in its own count table).
    Per-doc reduction and the per-source rollup are both map-side
    combined.
    """
    docs = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = docs.select("doc_id", "source", F.split("text", " ").alias("t"))
    stream = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("doc_id", "source", "bg.w1", "bg.w2")

    uni = (
        toks.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bi = stream.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_xy"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))

    k = BIGRAM_LM_K
    doc_nll = (
        stream.join(bi, ["w1", "w2"])
        .join(F.broadcast(uni.withColumnRenamed("w", "w1")), "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id", "source")
        .agg(
            F.avg(
                -F.log(
                    (F.col("c_xy") + F.lit(k)) / (F.col("c") + F.lit(k) * F.col("v"))
                )
            ).alias("nll")
        )
    )
    return doc_nll.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("nll"), 6).alias("avg_nll"),
        F.round(F.min("nll"), 6).alias("min_nll"),
        F.round(F.max("nll"), 6).alias("max_nll"),
    )


@query(
    "q_llm_tokenizer_fertility",
    oracle="""
        WITH d AS (
            SELECT lang, source,
                   CAST(length(text) AS BIGINT)                  AS chars,
                   CAST(len(string_split(text, ' ')) AS BIGINT)  AS ws_toks,
                   CAST(ceil(length(text) / 4.0) AS BIGINT)      AS bpe_toks
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        )
        SELECT lang, source,
               CAST(count(*) AS BIGINT)       AS n_docs,
               CAST(sum(chars) AS BIGINT)     AS chars_total,
               CAST(sum(ws_toks) AS BIGINT)   AS ws_tokens_total,
               CAST(sum(bpe_toks) AS BIGINT)  AS bpe_tokens_total,
               CAST(sum(chars) * 1000 // sum(ws_toks) AS BIGINT)
                                              AS ws_fertility_milli,
               CAST(sum(chars) * 1000 // sum(bpe_toks) AS BIGINT)
                                              AS bpe_fertility_milli
        FROM d GROUP BY lang, source
    """,
    description="Tokenizer fertility audit per (lang, source): chars per whitespace / BPE-estimate token in exact integer milli-units — the cross-language cost model a tokenizer change is judged by",
    tags=("llm", "text", "audit"),
)
def q_llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility (characters consumed per emitted token) per language
    and source — the number that decides how much compute a language
    actually costs under a given tokenizer, and the first audit run
    when swapping tokenizers. Two tokenizer models: whitespace tokens
    and the 4-chars-per-token BPE estimate (q_llm_text_stats' columns,
    aggregated corpus-wide). Empty/NULL documents are outside the
    boundary on both engines (fertility of nothing is undefined, and
    they would poison the denominator). Ratios are BIGINT
    floor-division milli-units: denominators are provably positive
    (every counted doc has >= 1 whitespace token and length > 0).

    Scale shape: one scan, row-local token counts (JVM split/size,
    no explode — the per-doc arrays never shuffle), one map-side
    combined groupBy onto (lang, source) cardinality."""
    toks = _tokens()
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "lang",
            "source",
            F.length("text").cast("long").alias("chars"),
            F.size(toks).cast("long").alias("ws_toks"),
            F.ceil(F.length("text") / 4.0).cast("long").alias("bpe_toks"),
        )
    )
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("chars_total"),
            F.sum("ws_toks").alias("ws_tokens_total"),
            F.sum("bpe_toks").alias("bpe_tokens_total"),
        )
        .select(
            "lang",
            "source",
            "n_docs",
            "chars_total",
            "ws_tokens_total",
            "bpe_tokens_total",
            F.expr("(chars_total * 1000) div ws_tokens_total")
            .cast("long")
            .alias("ws_fertility_milli"),
            F.expr("(chars_total * 1000) div bpe_tokens_total")
            .cast("long")
            .alias("bpe_fertility_milli"),
        )
    )


# Ensemble weights (milli-scale): length gate 400, lexical diversity
# (TTR) 300, stopword sanity 300. Integer end to end.
ENSEMBLE_W_LEN = 400
ENSEMBLE_W_TTR = 300
ENSEMBLE_W_STOP = 300
ENSEMBLE_HIGH = 700
ENSEMBLE_MID = 400


@query(
    "q_llm_quality_ensemble",
    oracle=f"""
        WITH s AS (
            SELECT source,
                   CASE WHEN length(text) BETWEEN 100 AND 20000
                        THEN 1 ELSE 0 END                         AS len_ok,
                   CAST(len(list_distinct(string_split(text, ' '))) * 1000
                        // len(string_split(text, ' ')) AS BIGINT) AS ttr_milli,
                   CAST(len(list_filter(string_split(text, ' '),
                                        t -> list_contains({list(STOPWORDS)!r}, t))) * 1000
                        // len(string_split(text, ' ')) AS BIGINT) AS stop_milli
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ),
        scored AS (
            SELECT source,
                   CAST(({ENSEMBLE_W_LEN} * len_ok * 1000
                         + {ENSEMBLE_W_TTR} * ttr_milli
                         + {ENSEMBLE_W_STOP} * (1000 - stop_milli)) // 1000
                        AS BIGINT) AS score_milli
            FROM s
        ),
        tiered AS (
            SELECT source,
                   CASE WHEN score_milli >= {ENSEMBLE_HIGH} THEN 'high'
                        WHEN score_milli >= {ENSEMBLE_MID} THEN 'mid'
                        ELSE 'low' END AS tier,
                   score_milli
            FROM scored
        )
        SELECT source, tier,
               CAST(count(*) AS BIGINT)          AS n_docs,
               CAST(sum(score_milli) AS BIGINT)  AS score_total_milli,
               CAST(min(score_milli) AS BIGINT)  AS score_min,
               CAST(max(score_milli) AS BIGINT)  AS score_max
        FROM tiered GROUP BY source, tier
    """,
    description="Weighted quality-ensemble scoring: length/TTR/stopword signals combined into one integer milli-score, tier census per source — the single promote/demote number downstream filters key on",
    tags=("llm", "text", "quality"),
)
def q_llm_quality_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Combines the per-doc quality signals into ONE weighted score —
    production filters rank on a single calibrated number, not three
    raw signals — and reports the tier census per source. Every signal
    is integer milli-scale (BIGINT floor division; counted docs have
    >= 1 token so denominators are positive) and the weighted sum is
    integer arithmetic, so the score is hash-exact by construction.
    Shares the documents-table boundary with the fertility audit
    (NULL/empty text outside).

    Scale shape: row-local token arrays (never shuffled), one
    map-side-combined groupBy onto (source, tier)."""
    toks = _tokens()
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    s = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select(
            "source",
            F.when(F.length("text").between(100, 20000), 1)
            .otherwise(0)
            .alias("len_ok"),
            (F.size(F.array_distinct(toks)).cast("long") * 1000).alias(
                "_ttr_num"
            ),
            (
                F.size(
                    F.filter(toks, lambda t: F.array_contains(stop_arr, t))
                ).cast("long")
                * 1000
            ).alias("_stop_num"),
            n_tok.cast("long").alias("_n_tok"),
        )
        .select(
            "source",
            "len_ok",
            F.expr("_ttr_num div _n_tok").alias("ttr_milli"),
            F.expr("_stop_num div _n_tok").alias("stop_milli"),
        )
    )
    scored = s.select(
        "source",
        F.expr(
            f"(({ENSEMBLE_W_LEN} * len_ok * 1000"
            f" + {ENSEMBLE_W_TTR} * ttr_milli"
            f" + {ENSEMBLE_W_STOP} * (1000 - stop_milli)) div 1000)"
        )
        .cast("long")
        .alias("score_milli"),
    )
    tiered = scored.select(
        "source",
        "score_milli",
        F.when(F.col("score_milli") >= ENSEMBLE_HIGH, "high")
        .when(F.col("score_milli") >= ENSEMBLE_MID, "mid")
        .otherwise("low")
        .alias("tier"),
    )
    return tiered.groupBy("source", "tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("score_milli").alias("score_total_milli"),
        F.min("score_milli").alias("score_min"),
        F.max("score_milli").alias("score_max"),
    )


OOV_VOCAB_K = 1000  # vocabulary = the corpus's top-K tokens


@query(
    "q_llm_oov_rate",
    oracle=f"""
        WITH tok AS (
            SELECT source, unnest(string_split(text, ' ')) AS t
            FROM documents
            WHERE text IS NOT NULL AND length(text) > 0
        ),
        vocab AS (
            SELECT t FROM (
                SELECT t, count(*) AS n,
                       row_number() OVER (ORDER BY count(*) DESC, t) AS rk
                FROM tok GROUP BY t
            ) WHERE rk <= {OOV_VOCAB_K}
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS tokens_total,
               CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS oov_tokens,
               CAST(sum(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS oov_ppm
        FROM tok LEFT JOIN vocab v USING (t)
        GROUP BY source
    """,
    description=f"Out-of-vocabulary rate per source vs the corpus top-{OOV_VOCAB_K} token vocabulary: aggregated token counts join the broadcast vocab (raw tokens never shuffle per occurrence), exact integer ppm",
    tags=("llm", "text", "audit"),
)
def q_llm_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer/vocabulary coverage audit: the fraction of token
    OCCURRENCES outside the corpus's own top-K vocabulary, per source
    — the number that decides whether a fixed vocab (or a domain
    tokenizer) will shred a new source into UNK/byte fallbacks.
    Vocabulary membership ties break (count desc, token asc), so the
    cut is deterministic on both engines.

    Scale shape: tokens aggregate to (source, token) COUNTS first (one
    map-side-combined groupBy — per-occurrence rows never survive the
    explode stage boundary), the top-K vocab is a TakeOrdered of the
    (small) global token-count table, and the membership probe is a
    broadcast left join of aggregated counts against the K-row vocab.
    The oracle joins raw occurrences (fine for DuckDB); the Spark side
    proves the aggregated-first shape is value-identical."""
    tok = (
        load(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length("text") > 0))
        .select("source", F.explode(_tokens()).alias("t"))
    )
    per_src = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n"))
    vocab = (
        per_src.groupBy("t")
        .agg(F.sum("n").alias("n_tot"))
        .orderBy(F.col("n_tot").desc(), "t")
        .limit(OOV_VOCAB_K)
        .select("t", F.lit(1).alias("in_vocab"))
    )
    return (
        per_src.join(F.broadcast(vocab), "t", "left")
        .groupBy("source")
        .agg(
            F.sum("n").alias("tokens_total"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("n")).otherwise(0)).alias(
                "oov_tokens"
            ),
        )
        .select(
            "source",
            "tokens_total",
            "oov_tokens",
            F.expr("(oov_tokens * 1000000) div tokens_total")
            .cast("long")
            .alias("oov_ppm"),
        )
    )


@query(
    "q_llm_mix_temperature",
    oracle="""
        WITH n AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents
            WHERE lang IS NOT NULL
            GROUP BY lang
        ),
        s AS (
            SELECT lang, n_docs,
                   CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1e6 + 0.5)
                        AS BIGINT) AS s_micros
            FROM n
        )
        SELECT lang,
               n_docs,
               CAST(n_docs * 1000000 // (SELECT sum(n_docs) FROM s)
                    AS BIGINT) AS prop_ppm,
               CAST(s_micros * 1000000 // (SELECT sum(s_micros) FROM s)
                    AS BIGINT) AS w_ppm,
               CAST(s_micros * 1000000 // (SELECT sum(s_micros) FROM s)
                    - n_docs * 1000000 // (SELECT sum(n_docs) FROM s)
                    AS BIGINT) AS boost_ppm
        FROM s
    """,
    description="Temperature-scaled sampling mix (alpha=0.5): per-language weights proportional to sqrt(n_docs) in exact ppm — the multilingual up/down-sampling table, with the boost over proportional sampling",
    tags=("llm", "sampling", "mix"),
)
def q_llm_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture weights — the standard multilingual
    rebalance (sample language i with w_i proportional to p_i^alpha,
    alpha=0.5): head languages are down-weighted, tail languages
    boosted, and boost_ppm quantifies it against proportional
    sampling. q_llm_mix_sample draws BY fixed rates; this key COMPUTES
    the rate table. Exactness: IEEE sqrt is correctly rounded, so
    floor(sqrt(n)*1e6+0.5) is the same BIGINT on both engines; weights
    then normalize with pure integer floor-division — no
    order-dependent double sums (the per-language s_micros are summed
    as BIGINTs).

    Scale shape: one map-side-combined count per language, then
    arithmetic over a language-cardinality table with its two scalar
    totals broadcast (Spark: a 1-row crossJoin, the repo's
    broadcast-scalar idiom). Nothing data-sized moves."""
    n = (
        load(spark, sf_dir, "documents")
        .filter(F.col("lang").isNotNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    s = n.withColumn(
        "s_micros",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1e6 + F.lit(0.5)).cast(
            "long"
        ),
    )
    totals = s.agg(
        F.sum("n_docs").alias("tot_docs"), F.sum("s_micros").alias("tot_s")
    )
    j = s.crossJoin(F.broadcast(totals))
    return j.select(
        "lang",
        "n_docs",
        F.expr("n_docs * 1000000 div tot_docs").alias("prop_ppm"),
        F.expr("s_micros * 1000000 div tot_s").alias("w_ppm"),
        F.expr(
            "s_micros * 1000000 div tot_s - n_docs * 1000000 div tot_docs"
        ).alias("boost_ppm"),
    )


@query(
    "q_llm_dataset_card",
    oracle="""
        WITH d AS (
            SELECT source, lang, text, n_chars,
                   CASE WHEN text IS NULL OR text = '' THEN 0
                        ELSE len(string_split(text, ' ')) END AS n_tok,
                   md5(coalesce(text, '')) AS h
            FROM documents
        ),
        per AS (
            SELECT source,
                   CAST(count(*) AS BIGINT)                 AS n_docs,
                   CAST(sum(n_chars) AS BIGINT)             AS n_chars,
                   CAST(sum(n_tok) AS BIGINT)               AS n_tokens,
                   CAST(count(DISTINCT lang) AS BIGINT)     AS n_langs,
                   CAST(count(DISTINCT h) AS BIGINT)        AS n_uniq,
                   CAST(sum(CASE WHEN text IS NULL OR text = ''
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
            FROM d GROUP BY source
        )
        SELECT source, n_docs, n_chars, n_tokens, n_langs, n_empty,
               CAST((n_docs - n_uniq) * 1000000 // n_docs AS BIGINT)
                   AS dup_ppm,
               CAST(n_tokens * 1000 // n_docs AS BIGINT)
                   AS tokens_per_doc_milli
        FROM per
    """,
    description="Dataset card per source: docs/chars/tokens, language spread, empty-doc count, exact-dup rate ppm, mean doc length — the one-pass summary every corpus release ships",
    tags=("llm", "corpus", "audit"),
)
def q_llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card table — the per-source summary a corpus
    release publishes (docs, volume in chars/tokens, language spread,
    empty-document count, exact-duplicate rate, mean length). The
    individual metrics exist as dedicated keys (text_stats, domain
    stats, exact dedup); a real release wants them in ONE pass over
    the corpus, and this key pins that composition: all seven metrics
    fold in a single groupBy over one scan — the multi-distinct is
    planned via expand, everything else is a conditional sum. Dup rate
    counts md5-identical texts (q_llm_exact_dedup's criterion) as
    (n_docs - distinct hashes) in exact ppm.

    Scale shape: one scan, one groupBy(source) with two distinct
    aggregates (Spark expands to 3x rows map-side, still combinable);
    token counts are size(split()) — JVM-side, no explode, the token
    STREAM never materializes. No join, no window, no Python."""
    d = load(spark, sf_dir, "documents").select(
        "source",
        "lang",
        "n_chars",
        F.when(
            F.col("text").isNull() | (F.col("text") == ""), 0
        )
        .otherwise(F.size(F.split("text", " ")))
        .alias("n_tok"),
        F.md5(F.coalesce(F.col("text"), F.lit(""))).alias("h"),
        F.when(F.col("text").isNull() | (F.col("text") == ""), 1)
        .otherwise(0)
        .alias("is_empty"),
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_tok").alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("h").alias("n_uniq"),
        F.sum("is_empty").alias("n_empty"),
    )
    return per.select(
        "source",
        "n_docs",
        "n_chars",
        "n_tokens",
        "n_langs",
        "n_empty",
        F.expr("(n_docs - n_uniq) * 1000000 div n_docs").alias("dup_ppm"),
        F.expr("n_tokens * 1000 div n_docs").alias("tokens_per_doc_milli"),
    )


TOPP_PCT = 60  # nucleus cut: smallest high-quality prefix covering 60%


@query(
    "q_llm_sample_topp",
    oracle=f"""
        WITH d AS (
            SELECT source, doc_id, n_chars,
                   sum(n_chars) OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id
                   ) - n_chars AS cum_prev,
                   sum(n_chars) OVER (PARTITION BY source) AS total_chars
            FROM documents
        )
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(max(total_chars) AS BIGINT) AS total_chars,
               CAST(sum(CASE WHEN 100 * cum_prev < {TOPP_PCT} * total_chars
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
               CAST(sum(CASE WHEN 100 * cum_prev < {TOPP_PCT} * total_chars
                             THEN n_chars ELSE 0 END) AS BIGINT)
                                                      AS selected_chars,
               CAST(sum(CASE WHEN 100 * cum_prev < {TOPP_PCT} * total_chars
                             THEN n_chars ELSE 0 END) * 1000000
                    // max(total_chars) AS BIGINT)    AS selected_ppm,
               CAST(min(CASE WHEN 100 * cum_prev < {TOPP_PCT} * total_chars
                             THEN n_chars END) AS BIGINT) AS cut_n_chars
        FROM d
        GROUP BY source
    """,
    description=f"Nucleus (top-p) corpus selection per source: the smallest quality-ranked prefix covering {TOPP_PCT}% of chars, via the chunked two-level rank+prefix-sum (no single-partition sort); integer cut predicate (100*cum_prev < p*total)",
    tags=("llm", "sampling", "window"),
)
def q_llm_sample_topp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p ("nucleus") data selection (r13) — the corpus-curation
    move of keeping the best documents up to a mass budget instead of
    a fixed count: per source, rank docs by quality (here the n_chars
    proxy, ties by doc_id) and keep the SMALLEST prefix whose char
    mass reaches p% of the source. Complements q_llm_mix_sample /
    q_llm_mix_temperature (which weight BETWEEN sources — this key
    selects WITHIN one) and q_llm_curriculum (tiering, not cutting).
    Membership is an integer cross-product predicate
    (100*cum_before < p*total — no division, no floats), so the
    boundary document is identical on both engines.

    Scale shape: the per-source rank + running char sum ride
    operators/ranking.chunked_row_number's prefix-sum path ((quality,
    id-range) chunks, offsets broadcast back) — never a whole-source
    sort partition; the cut + rollup is one combinable aggregation."""
    from ..operators.ranking import chunked_row_number

    d = load(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars", (-F.col("n_chars")).alias("neg_chars")
    )
    ranked = chunked_row_number(
        d,
        ["neg_chars", "doc_id"],
        [(F.floor(F.col("neg_chars") / 256)).cast("long")],
        part_cols=["source"],
        rank_name="rk",
        prefix_sums={"n_chars": "cum_chars"},
    )
    totals = d.groupBy("source").agg(F.sum("n_chars").alias("total_chars"))
    r = ranked.join(F.broadcast(totals), "source").withColumn(
        "cum_prev", F.col("cum_chars") - F.col("n_chars")
    )
    sel = (100 * F.col("cum_prev")) < (TOPP_PCT * F.col("total_chars"))
    return r.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("total_chars").alias("total_chars"),
        F.sum(F.when(sel, 1).otherwise(0)).alias("n_selected"),
        F.sum(F.when(sel, F.col("n_chars")).otherwise(0)).alias(
            "selected_chars"
        ),
        F.expr(
            f"sum(CASE WHEN 100 * cum_prev < {TOPP_PCT} * total_chars"
            " THEN n_chars ELSE 0 END) * 1000000 div max(total_chars)"
        ).alias("selected_ppm"),
        F.min(F.when(sel, F.col("n_chars"))).alias("cut_n_chars"),
    )


BUDGET_TOKENS = 1_000_000  # tokens to apportion across sources


@query(
    "q_llm_token_budget",
    oracle=f"""
        WITH w AS (
            SELECT source, CAST(sum(n_chars) AS BIGINT) AS weight
            FROM documents GROUP BY source
        ),
        tot AS (SELECT CAST(sum(weight) AS BIGINT) AS wt,
                       CAST(count(*) AS BIGINT)    AS n_src
                FROM w),
        quota AS (
            SELECT source, weight,
                   {BUDGET_TOKENS} * weight // (SELECT wt FROM tot) AS base,
                   ({BUDGET_TOKENS} * weight) % (SELECT wt FROM tot) AS rem
            FROM w
        ),
        ranked AS (
            SELECT *,
                   row_number() OVER (ORDER BY rem DESC, source) AS rr,
                   {BUDGET_TOKENS} - sum(base) OVER () AS leftover
            FROM quota
        )
        SELECT source, weight, CAST(base AS BIGINT) AS base_alloc,
               CAST(CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
                   AS extra,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                    AS BIGINT) AS alloc_tokens
        FROM ranked
    """,
    description=f"Largest-remainder (Hamilton) apportionment of a {BUDGET_TOKENS}-token training budget across sources by char mass: exact integer quotas, remainder ranks break ties by source; allocations sum to the budget exactly",
    tags=("llm", "sampling", "aggregate"),
)
def q_llm_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix budgeting (r13): turn per-source weights into an
    INTEGER token allocation that sums EXACTLY to the budget — the
    apportionment problem every data-mix config hits the moment
    weights become sampling counts (naive rounding over- or
    under-shoots by up to n_sources/2 tokens). Hamilton's
    largest-remainder method in pure integers: base = B*w div W,
    and the B - sum(base) leftover tokens go to the largest
    remainders (B*w mod W, ties by source name) — deterministic,
    exact, and the standard choice when quota monotonicity matters
    less than hitting the budget (documented trade vs divisor
    methods). Complements q_llm_mix_sample / _mix_temperature (which
    produce the WEIGHTS; this key turns weights into counts).

    Scale shape: weights are one combinable groupBy; everything after
    runs on the n_sources-row table (window over ~dozens of rows —
    driver-free and trivially bounded); the 1-row total broadcasts."""
    w = (
        load(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").alias("weight"))
    )
    tot = w.agg(
        F.sum("weight").alias("wt"), F.count(F.lit(1)).alias("n_src")
    )
    quota = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "weight",
        F.expr(f"{BUDGET_TOKENS} * weight div wt").alias("base"),
        F.expr(f"({BUDGET_TOKENS} * weight) % wt").alias("rem"),
    )
    win = Window.orderBy(F.col("rem").desc(), "source")
    ranked = quota.select(
        "*",
        F.row_number().over(win).alias("rr"),
        (
            F.lit(BUDGET_TOKENS)
            - F.sum("base").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
        ).alias("leftover"),
    )
    return ranked.select(
        "source",
        "weight",
        F.col("base").alias("base_alloc"),
        F.when(F.col("rr") <= F.col("leftover"), 1)
        .otherwise(0)
        .cast("long")
        .alias("extra"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc_tokens"),
    )
