"""Short-text edge corpus: Spark vs DuckDB on texts the fixture never has.

Spark's ``sequence(1, 0)`` is the DESCENDING ``[1, 0]`` while DuckDB's
``range(1, 1)`` is empty, so every n-gram/shingle expression needs an
explicit too-short guard or it either crashes (element_at out of
bounds) or silently fabricates junk shingles only on the Spark side.
The fixture's documents are all long enough to mask this, so this test
runs the affected queries end-to-end on a tiny corpus of empty,
single-char, single-token, and sub-n-gram texts with the SAME DuckDB
oracle the driver uses.
"""

from __future__ import annotations

import pytest

from conftest import make_duck_views, run_parity
from sparkstreamingtohdfsofsensorsdata_spark import registry

# doc_ids chosen to pass every query's slice filter (doc_id < 60 for
# ngram_jaccard, % 3 == 1 for repetition, % 3 == 0 text_stats,
# % 5 == 0 tokenize_vocab, % 10 == 0 tfidf, % 13 == 0 pii). Includes
# one normal text so results are non-degenerate, plus the hostile
# rows: NULL text (never in any fixture), whitespace-only, unicode +
# CJK (the lang-id script branch), all-stopwords, an emoji run, a
# single very long token, and PII-shaped content.
DOCS = [
    (0, None, "en", "web", 0),
    (1, "", "en", "web", 0),
    (3, "   ", "en", "wiki", 3),
    (4, "x", "en", "web", 1),
    (6, "école naïve häuser 中文文本 mixed", "de", "web", 24),
    (7, "ab", "en", "wiki", 2),
    (9, "😀 😀 😀 the the the", "en", "web", 17),
    (10, "abcd", "en", "wiki", 4),
    (12, "the a and of to in", "en", "web", 18),
    (13, "word", "en", "web", 4),
    (15, "supercalifragilisticexpialidociousantidisestablishmentarianism", "en", "wiki", 62),
    (16, "two words", "en", "web", 9),
    (19, "a slightly longer text with several words in it", "en", "wiki", 48),
    (22, "another ordinary document text for company", "en", "web", 42),
    (26, "contact me at foo@bar.com or 555-123-4567 now", "en", "web", 45),
]

KEYS = [
    "q_llm_ngram_jaccard",
    "q_llm_minhash_lsh",
    "q_llm_fingerprint",
    "q_llm_repetition",
    # round-8 additions over the same hostile documents surface
    "q_llm_dedup_incremental",
    "q_llm_length_bucket",
    "q_llm_split_assign",
    "q_llm_shard_assign",
    "q_llm_unigram_logprob",
    "q_llm_url_normalize",
    "q_llm_ngram_containment",
    "q_llm_passage_dedup",
    "q_llm_pmi_bigrams",
    "q_llm_entropy",
    "q_llm_feature_hash",
    "q_llm_bigram_lm",
    "q_llm_source_overlap",
    "q_llm_winnowing",
    # the rest of the deterministic documents-reading surface, now
    # exposed to NULL/whitespace/unicode/emoji/stopword-only texts
    "q_llm_text_stats",
    "q_llm_quality",
    "q_llm_lang_id",
    "q_llm_tfidf",
    "q_llm_corpus_prep",
    "q_llm_pii_redact",
    "q_llm_domain_stats",
    "q_llm_boilerplate",
    "q_llm_tokenize_vocab",
    "q_llm_chunk",
    "q_llm_pack",
    "q_llm_exact_dedup",
    "q_llm_simhash",
    "q_llm_simhash_banded",
    "q_llm_simhash_banded128",
    "q_llm_mix_sample",
    "q_llm_mix_temperature",
    "q_llm_dataset_card",
    "q_fn_collation",
    "q_llm_bpe_train",
    "q_llm_contamination",
    "q_llm_split_leakage",
    "q_llm_dedup_clusters",
    "q_llm_dedup_keep",
    # r13: nucleus selection + budget apportionment read (source,
    # n_chars) — NULL-text rows carry n_chars 0, the degenerate mass
    # these keys must cut/apportion correctly
    "q_llm_sample_topp",
    "q_llm_token_budget",
]


@pytest.fixture(scope="module")
def short_sf_dir(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("short_sf")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    return str(sf_dir)


@pytest.fixture(scope="module")
def short_duck(short_sf_dir):
    con = make_duck_views(short_sf_dir, tables=["documents"])
    yield con
    con.close()


@pytest.mark.parametrize("name", KEYS)
def test_short_text_matches_oracle(spark, short_sf_dir, short_duck, name):
    # the SAME compare as every other parity test — a tolerance or
    # normalization change in conftest.run_parity propagates here
    run_parity(spark, short_duck, name, short_sf_dir)


# The multimodal payload is encode(text, UTF-8), and head_byte is the
# first BYTE of that payload — on the all-ASCII fixture byte ==
# codepoint, which masked both an oracle divergence (ascii() returns
# the codepoint: 'é' -> 233, not the UTF-8 lead byte 195) and a task
# crash (empty payload -> NaN -> astype raises). This corpus has a
# 2-, 3-, and 4-byte-lead head char plus an empty text; doc_ids are
# chosen so every row passes at least one modality's slice filter
# (% 4 / % 5 / % 6 == 0).
MODAL_DOCS = [
    (120, None, "en", "web", 0),  # NULL text: empty payload, not a crash
    (0, "", "en", "web", 0),
    (12, "école est belle", "fr", "web", 15),
    (20, "€ price list", "en", "wiki", 12),
    (24, "😀 emoji head", "en", "web", 12),
    (30, "plain ascii document", "en", "wiki", 20),
    (60, "ñandú", "es", "web", 5),
]

MODAL_KEYS = [
    "q_llm_multimodal",
    "q_llm_multimodal_frames",
    "q_llm_multimodal_audio",
]


@pytest.fixture(scope="module")
def modal_sf_dir(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("modal_sf")
    spark.createDataFrame(
        MODAL_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    return str(sf_dir)


@pytest.fixture(scope="module")
def modal_duck(modal_sf_dir):
    con = make_duck_views(modal_sf_dir, tables=["documents"])
    yield con
    con.close()


@pytest.mark.parametrize("name", MODAL_KEYS)
def test_multimodal_non_ascii_matches_oracle(spark, modal_sf_dir, modal_duck, name):
    run_parity(spark, modal_duck, name, modal_sf_dir)
