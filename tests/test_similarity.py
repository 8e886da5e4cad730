"""ANN quality gates: the approximate tiers must actually approximate.

Both ANN queries return per-query recall@k against the exact top-k, so
"is the accuracy/cost trade acceptable" is a measured assertion, not a
claim. Per-tier floors (r11, VERDICT r10 item 3): LSH 0.75 (measured
0.88-0.89 at L=24/b=5), IVF 0.55 (measured 0.62-0.72 at nprobe=6) —
~0.1 under the worst measured SF because the fixture embeddings are
uniform random (no cluster structure), the hardest case for
space-partitioning ANN.
"""

from __future__ import annotations

from sparkstreamingtohdfsofsensorsdata_spark import registry

SF = "/root/testdata/sf0.01"


def _mean_recall(spark, recall_fn) -> float:
    rows = recall_fn(spark, SF).collect()
    assert rows, "ANN tier returned no per-query rows"
    return sum(r.recall_at_k for r in rows) / len(rows)


def test_ivf_recall_floor(spark):
    from sparkstreamingtohdfsofsensorsdata_spark.llm.similarity import (
        IVF_RECALL_FLOOR,
        _ivf_recall,
    )

    assert _mean_recall(spark, _ivf_recall) >= IVF_RECALL_FLOOR


def test_lsh_recall_floor(spark):
    from sparkstreamingtohdfsofsensorsdata_spark.llm.similarity import (
        LSH_RECALL_FLOOR,
        _lsh_recall,
    )

    assert _mean_recall(spark, _lsh_recall) >= LSH_RECALL_FLOOR


def test_pq_recall_floor(spark):
    from sparkstreamingtohdfsofsensorsdata_spark.llm.similarity import (
        PQ_RECALL_FLOOR,
        _pq_recall,
    )

    assert _mean_recall(spark, _pq_recall) >= PQ_RECALL_FLOOR


def test_ann_bound_asserted_contract(spark):
    """The registry-facing ANN keys emit the hash-gated contract shape:
    one row per strided boundary-passing query, mean_recall_ok TRUE on
    every row (what the DuckDB oracle asserts literally)."""
    for name in ("q_llm_sim_topk_ivf", "q_llm_sim_topk_lsh", "q_llm_sim_topk_pq"):
        rows = registry.load_all()[name].fn(spark, SF).collect()
        assert rows, name
        assert all(r.mean_recall_ok for r in rows), name
        assert len({r.qid for r in rows}) == len(rows), name


def test_simhash_banding_complete_within_hamming_3(spark):
    """Pigeonhole guarantee, checked on data: 4 x 8-bit bands surface
    EXACTLY the pairs within Hamming distance SIMHASH_BANDS-1 = 3 that
    a quadratic all-pairs pass finds — banding loses nothing inside the
    guaranteed radius."""
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import (
        SIMHASH_HAMMING_MAX,
        _simhash_df,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    sf = "/root/testdata/sf0.001"
    s = _simhash_df(load(spark, sf, "documents"))
    a, b = s.alias("a"), s.alias("b")
    exact = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
            )
            .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
            .collect()
        )
    }
    banded = {
        (r.id_a, r.id_b)
        for r in registry.load_all()["q_llm_simhash_banded"].fn(spark, sf).collect()
    }
    assert exact, "fixture has no near-pairs; test is vacuous"
    assert banded == exact


def test_hll_union_error_bound(spark):
    # lgK=12 gives ~1.6% relative standard error; the query itself now
    # emits the 5% bound check (per segment AND for the
    # union-of-sketches global estimate) as a hash-gated boolean —
    # assert it held on every row.
    from sparkstreamingtohdfsofsensorsdata_spark import registry

    rows = registry.load_all()["q_agg_hll_union"].fn(spark, SF).collect()
    assert {r.level for r in rows} > {"_global"}
    for r in rows:
        assert r.within_bound, r


def test_cc_clusters_are_consistent(spark):
    # Structural invariants, independent of the oracle: both endpoints
    # of every near-dup edge land in the same cluster, the cluster id
    # is the minimum member, and cluster_size matches the member count.
    from collections import Counter

    from sparkstreamingtohdfsofsensorsdata_spark import registry
    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import (
        _simhash_banded_pairs,
    )

    sf = "/root/testdata/sf0.001"
    rows = registry.load_all()["q_llm_dedup_clusters"].fn(spark, sf).collect()
    cluster = {r.doc_id: r.cluster_id for r in rows}
    sizes = Counter(r.cluster_id for r in rows)
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
    members = {}
    for doc, cl in cluster.items():
        members.setdefault(cl, []).append(doc)
    for cl, docs in members.items():
        assert cl == min(docs)
    for p in _simhash_banded_pairs(spark, sf).collect():
        assert cluster[p.id_a] == cluster[p.id_b], p


def test_cc_labels_at_bench_scale_match_union_find(spark):
    # The DuckDB recursive-CTE oracle for the CC queries is a full
    # transitive closure and was unaffordable on the old 32-bit pair
    # graph — so the distributed propagation loop is checked at sf0.1
    # against an exact union-find over the SAME pair table instead.
    # (The hypothesis property pins the loop on small arbitrary graphs;
    # this pins it on the real clustered graph at bench scale. The
    # r16 64-bit signature shrank the sf0.1 pair table from ~425k to
    # ~2k TRUE near-dup pairs — the old density was 8-bit band
    # saturation noise at hamming<=3-of-32, not duplication.)
    from test_properties import _union_find_min_labels

    from sparkstreamingtohdfsofsensorsdata_spark.llm import dedup

    sf = "/root/testdata/sf0.1"
    pairs = [
        (r["id_a"], r["id_b"])
        for r in dedup._simhash_banded_pairs(spark, sf)
        .select("id_a", "id_b")
        .collect()
    ]
    assert len(pairs) > 1_000  # non-trivial clustered graph
    got = {
        r["node"]: r["label"] for r in dedup._cc_labels(spark, sf).collect()
    }
    assert got == _union_find_min_labels(pairs)


def test_mg_candidates_superset_of_true_topk(spark):
    # The Misra-Gries guarantee made executable for the r17 text
    # kernel: the candidate union must contain every gram of the exact
    # top-25 (it provably contains every gram with count >
    # N/(capacity+1); the fixture's 25th count clears that floor by
    # >10x), and each partition emits at most MG_CAPACITY candidates.
    # The exact top-25 is computed from the RETAINED JVM spelling
    # (_gram_stream), so this also cross-checks the kernel's gram
    # domain against the executable spec.
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.operators.aggregates import (
        HEAVY_HITTERS_K,
        MG_CAPACITY,
        _docs_stream,
        _gram_stream,
        _mg_candidates_text,
    )

    docs = _docs_stream(spark, SF)
    n_parts = docs.rdd.getNumPartitions()
    cands = {
        r.gram
        for r in docs.mapInArrow(_mg_candidates_text, "gram string").collect()
    }
    assert len(cands) <= n_parts * MG_CAPACITY
    true_topk = {
        r.gram
        for r in _gram_stream(spark, SF)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "gram")
        .limit(HEAVY_HITTERS_K)
        .collect()
    }
    assert true_topk <= cands


def test_gram_kernel_matches_jvm_spelling(spark):
    # The Python gram generator (_count_grams_into, used by both r17
    # heavy-hitters passes) must produce EXACTLY the multiset the
    # retained JVM HOF spelling (_gram_stream) produces — empty-token
    # splits, short docs, and unicode included. Full-count equality on
    # the sf0.001 fixture corpus is the strongest cheap pin.
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.operators.aggregates import (
        _count_grams_into,
        _gram_stream,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    jvm = {
        r.gram: r.freq
        for r in _gram_stream(spark, SF)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("freq"))
        .collect()
    }
    texts = [
        r.text
        for r in load(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .collect()
    ]
    # hostile edges the fixture may not cover
    texts += ["", " ", "a", "a b", "a  b c", "x y z w", "é 中 é 中"]
    for tx in ["", " ", "a", "a b", "a  b c", "x y z w", "é 中 é 中"]:
        row = spark.createDataFrame([(0, tx)], "doc_id long, text string")
        toks = F.split(F.col("text"), " ")
        tri = F.when(
            F.size(toks) >= 3,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - 3),
                lambda i: F.concat_ws(
                    " ",
                    F.element_at(toks, i + 1),
                    F.element_at(toks, i + 2),
                    F.element_at(toks, i + 3),
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        for r in row.select(
            F.explode(F.concat(toks, tri)).alias("gram")
        ).collect():
            jvm[r.gram] = jvm.get(r.gram, 0) + 1
    py: dict = {}
    _count_grams_into(py, texts)
    assert py == jvm


def test_semdedup_drop_rule_and_threshold(spark):
    # Every dropped vector must cite a kept representative with a
    # strictly smaller id and cosine >= tau, appear exactly once, and
    # share the representative's bucket by construction.
    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import SEMDEDUP_TAU
    from sparkstreamingtohdfsofsensorsdata_spark import registry as reg

    rows = reg.load_all()["q_llm_semdedup"].fn(spark, SF).collect()
    assert rows, "fixture threshold should keep the prune path non-empty"
    seen = set()
    for r in rows:
        assert r.kept_id < r.dropped_id
        assert r.cosine >= SEMDEDUP_TAU
        assert r.dropped_id not in seen
        seen.add(r.dropped_id)


def test_simhash128_banded_equals_all_pairs(spark):
    """r16 next-decade tier: the 4x32-bit banding over the 128-bit
    signature must find EXACTLY the all-pairs set within the pigeonhole
    radius — same completeness contract as the 64-bit key."""
    from pyspark.sql import functions as F

    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import (
        SIMHASH_HAMMING_MAX,
        _simhash128_df,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    sf = "/root/testdata/sf0.001"
    s = _simhash128_df(load(spark, sf, "documents"))
    a, b = s.alias("a"), s.alias("b")
    exact = {
        (r.id_a, r.id_b)
        for r in (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.expr(
                    "bit_count(a.lo ^ b.lo) + bit_count(a.hi ^ b.hi)"
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
            .collect()
        )
    }
    banded = {
        (r.id_a, r.id_b)
        for r in registry.load_all()["q_llm_simhash_banded128"]
        .fn(spark, sf)
        .collect()
    }
    assert exact, "fixture has no 128-bit near-pairs; test is vacuous"
    assert banded == exact


def test_simhash_arrow_fold_matches_sql_spelling(spark):
    """r16 fold rewrite: the vectorized Arrow kernel must be
    bit-identical to the retained JVM-SQL spelling (the spec the
    DuckDB oracle mirrors) — fixture corpus plus the null/empty/
    whitespace/unicode edge rows the SQL fold has pinned semantics
    for (NULL text folds to signature 0, not NULL)."""
    from pyspark.sql import types as T

    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import (
        _simhash128_df,
        _simhash128_df_sql,
        _simhash_df,
        _simhash_df_sql,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (10**9 + 1, None),
            (10**9 + 2, ""),
            (10**9 + 3, " "),
            (10**9 + 4, "héllo héllo wörld 你好"),
        ],
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    corpus = docs.unionByName(edge)
    got = {r.doc_id: r.simhash for r in _simhash_df(corpus).collect()}
    want = {r.doc_id: r.simhash for r in _simhash_df_sql(corpus).collect()}
    assert got == want and len(got) > 4
    got128 = {r.doc_id: (r.lo, r.hi) for r in _simhash128_df(corpus).collect()}
    want128 = {
        r.doc_id: (r.lo, r.hi) for r in _simhash128_df_sql(corpus).collect()
    }
    assert got128 == want128


def test_minhash_sig_arrow_matches_sql_spelling(spark):
    """r16 signature-build rewrite: the Arrow kernel must reproduce
    the SQL spelling exactly — including the [NULL]*12 signature for
    NULL-text and <2-token docs (size(NULL)>=2 is NULL -> else branch
    -> empty shingle array -> array_min over empty = NULL) and the
    binary string ordering of array_min (lowercase hex is ASCII, so
    Python min == UTF8String compare)."""
    from pyspark.sql import types as T

    from sparkstreamingtohdfsofsensorsdata_spark.llm.dedup import (
        _minhash_sig_arrow,
        _minhash_sig_sql,
    )
    from sparkstreamingtohdfsofsensorsdata_spark.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    edge = spark.createDataFrame(
        [
            (10**9 + 1, None),
            (10**9 + 2, ""),
            (10**9 + 3, "one"),
            (10**9 + 4, "a b"),
            (10**9 + 5, "héllo wörld héllo wörld 你好 你好"),
        ],
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    corpus = docs.unionByName(edge)
    got = {r.doc_id: tuple(r.sig) for r in _minhash_sig_arrow(corpus).collect()}
    want = {r.doc_id: tuple(r.sig) for r in _minhash_sig_sql(corpus).collect()}
    assert got == want and len(got) > 5
    assert got[10**9 + 1] == (None,) * 12
    assert got[10**9 + 3] == (None,) * 12
