"""Unicode-hostile corpus: Spark vs DuckDB on codepoint-level traps.

The fixture corpus (and the short-text tier) is mostly ASCII with a few
precomposed accents, which masks the places where the JVM's and
DuckDB's unicode handling can legitimately diverge:

- casing: ``lower()`` is JVM ``UTF8String.toLowerCase`` on the Spark
  side and utf8proc on the DuckDB side — Turkish İ (U+0130), German ß,
  Greek final sigma, and the fi/fl ligatures are the classic split
  points;
- normalization: NFC "café" and NFD "cafe<combining acute>" are
  different codepoint sequences that render identically — hashing,
  length, and n-gram queries must treat them as the distinct strings
  they are, on BOTH engines;
- segmentation: zero-width space (U+200B) and ZWJ emoji families ride
  INSIDE tokens for an ASCII ``\\s``-based splitter; NBSP (U+00A0) and
  ideographic space (U+3000) are whitespace to humans but not to
  ASCII-class regexes — Java regex and DuckDB's RE2 agree on the ASCII
  classes, and this tier pins that agreement;
- width: full-width letters/digits (U+FF21.., U+FF10..) fail ASCII
  ``[a-z0-9]`` classes; astral-plane chars (U+1D578, U+20E0E) are two
  UTF-16 units on the JVM — any function counting units instead of
  codepoints (length, substring/chunk boundaries) diverges from DuckDB
  here.

Invisible codepoints (ZWSP/ZWJ/NBSP/ideographic space, the non-BMP
block) are spelled as ``\\uXXXX`` escapes, the NFD rows are decomposed
at runtime with ``unicodedata.normalize``, and
``test_corpus_codepoints_intact`` pins the visible-but-normalizable
rest (ligatures, full-width forms) — so an editor/formatter/VCS
normalization pass cannot silently strip the hostile codepoints while
the differential keeps passing on the blunted corpus. Every query runs
end-to-end against the SAME DuckDB oracle the driver uses; a pass means
bit-identical results (modulo the two documented float classes).
"""

from __future__ import annotations

import unicodedata

import pytest

from conftest import make_duck_views, run_parity

ZWSP = "\u200b"
ZWJ = "\u200d"
NBSP = "\u00a0"
IDEO_SP = "\u3000"

# ZWJ family (man+woman+girl+boy) and a skin-toned astronaut
FAMILY = "\U0001F468" + ZWJ + "\U0001F469" + ZWJ + "\U0001F467" + ZWJ + "\U0001F466"
ASTRONAUT = "\U0001F469\U0001F3FD" + ZWJ + "\U0001F680"

# doc_ids chosen to pass every query's slice filter (doc_id < 60 for
# ngram_jaccard, % 3 == 1 repetition, % 3 == 0 text_stats, % 5 == 0
# tokenize_vocab, % 10 == 0 tfidf, % 13 == 0 pii), with a plain-ASCII
# control row so results stay non-degenerate.
_TEXTS = [
    # NFC precomposed vs the NFD decomposition of the SAME rendering:
    # distinct codepoint sequences — hash/length must see the bytes.
    (0, "café café déjà vu café", "fr", "web"),
    (1, unicodedata.normalize("NFD", "café café déjà vu"), "fr", "web"),
    (3, "İstanbul ISPARTA ışık İİİ", "tr", "wiki"),  # Turkish İ/ı
    (4, "Straße GROSS ß STRASSE straße", "de", "web"),  # sharp s
    (5, "ΣΟΦΟΣ σοφος Σίσυφος", "el", "wiki"),  # final sigma
    (6, "مرحبا بالعالم نص عربي", "ar", "web"),  # RTL Arabic
    (7, "שלום עולם טקסט עברי", "he", "web"),  # RTL Hebrew
    (9, f"foo{ZWSP}bar baz{ZWSP}qux repeated repeated word", "en", "web"),  # ZWSP in-token
    (10, f"{FAMILY} family {ASTRONAUT} astronaut emoji", "en", "web"),  # ZWJ runs
    (12, "ＦＵＬＬＷＩＤＴＨ ｔｅｘｔ ０１２３ ＡＢＣ", "en", "wiki"),  # full-width
    (13, "\U0001d578\U0001d586\U0001d599\U0001d525 \U0001d587\U0001d594\U0001d591\U0001d589 \U00020e0e\U00020e31\U00020779 astral plane chars", "en", "web"),  # non-BMP
    (15, "tab\there and\tthere columns", "en", "web"),  # embedded tabs
    (16, f"space{NBSP}nbsp{IDEO_SP}ideographic gap word", "en", "wiki"),  # exotic spaces
    (18, "ligature ﬁnal ﬂow oﬃce ﬅring", "en", "web"),  # fi/fl/ffi/st
    (19, "normal english control document with several plain words", "en", "wiki"),
    (21, "ÅNGSTRÖM ångström ÅÅ angstrom sign", "sv", "web"),  # Å vs U+212B
    (22, "mixed 中文 and English 語言 text here", "zh", "web"),
    (25, "ПРИВЕТ мир КИРИЛЛИЦА тест", "ru", "wiki"),  # Cyrillic
    (26, unicodedata.normalize("NFD", "école élève français mots"), "fr", "web"),  # NFD French
    (39, "final ascii row for jaccard overlap with plain words", "en", "web"),
]

DOCS = [(i, t, lang, src, len(t)) for (i, t, lang, src) in _TEXTS]

KEYS = [
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
    "q_llm_bpe_train",
    "q_llm_contamination",
    "q_llm_split_leakage",
    "q_llm_dedup_clusters",
    "q_llm_dedup_keep",
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
    "q_llm_mix_temperature",
    "q_llm_dataset_card",
    "q_fn_collation",
    "q_llm_ngram_containment",
    "q_llm_passage_dedup",
    "q_llm_pmi_bigrams",
    "q_llm_entropy",
    "q_llm_feature_hash",
    "q_llm_bigram_lm",
    "q_llm_source_overlap",
    "q_llm_winnowing",
]


@pytest.fixture(scope="module")
def uni_sf_dir(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("unicode_sf")
    spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(sf_dir / "documents.parquet"))
    return str(sf_dir)


@pytest.fixture(scope="module")
def uni_duck(uni_sf_dir):
    con = make_duck_views(uni_sf_dir, tables=["documents"])
    yield con
    con.close()


def test_corpus_codepoints_intact():
    # The tier is only as hostile as its codepoints: if a formatter or
    # VCS normalization pass (NFC/NFKC) ever blunts the corpus, the
    # differential would keep passing on the neutered rows with no
    # signal. Pin the load-bearing codepoints by ordinal.
    # (expected values spelled as escapes — the pins must not be
    # normalizable by the same pass they guard against)
    texts = {i: t for (i, t, _l, _s) in _TEXTS}
    assert "\u0301" in texts[1] and "\u00e9" not in texts[1]  # NFD acute
    assert "\u0130" in texts[3] and "\u0131" in texts[3]  # İ and ı
    assert "\u00df" in texts[4]  # ß
    assert "\u03c2" in texts[5]  # final sigma
    assert texts[9].count(ZWSP) == 2
    assert texts[10].count(ZWJ) == 4
    assert "\uff26" in texts[12] and "\uff10" in texts[12]  # full-width F, 0
    assert "\U0001d578" in texts[13] and "\U00020e0e" in texts[13]
    assert texts[15].count("\t") == 2
    assert NBSP in texts[16] and IDEO_SP in texts[16]
    assert "\ufb01" in texts[18] and "\ufb03" in texts[18]  # fi, ffi
    assert "\u0301" in texts[26] and "\u00e9" not in texts[26]  # NFD
    # and the schema n_chars column counts codepoints of exactly these
    for i, t, _l, _s, n in DOCS:
        assert n == len(t)


@pytest.mark.parametrize("name", KEYS)
def test_unicode_matches_oracle(spark, uni_sf_dir, uni_duck, name):
    # the SAME compare as every other parity test — a tolerance or
    # normalization change in conftest.run_parity propagates here
    run_parity(spark, uni_duck, name, uni_sf_dir)
