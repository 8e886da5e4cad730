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
LSH_PLANES = 5
LSH_TABLES = 24
LSH_SEED = 42
# Per-tier mean-recall@k floors each ANN tier asserts IN its output
# (hash-gated via the oracle, VERDICT r7 item 2) and that
# tests/test_similarity.py re-asserts. Raised from the shared 0.25 in
# r11 (VERDICT r10 item 3) after tuning: LSH at L=24/b=5 measures mean
# recall@10 = 0.88/0.89/0.89 at sf0.001/0.01/0.1 with no measurable
# cost increase over L=12; IVF at nprobe=6/nlist=16 measures
# 0.72/0.67/0.62. Floors sit ~0.1 under the worst measured SF: the
# fixture embeddings are uniform random (no cluster structure), the
# hardest case for space-partitioning ANN, so margins are deliberate —
# a regenerated fixture must not flip the oracle-gated boolean.
LSH_RECALL_FLOOR = 0.75
IVF_RECALL_FLOOR = 0.55


# DuckDB-side mirror of the _as_double boundary, for every oracle in
# the family: NULL/empty vectors AND vectors with NaN/NULL elements are
# outside it (see _as_double).
VEC_BOUNDARY_SQL = (
    "len(embedding) > 0 AND len(list_filter(embedding, "
    "x -> x IS NULL OR isnan(CAST(x AS DOUBLE)))) = 0"
)


def _as_double(df: DataFrame) -> DataFrame:
    """Widen to float64 AND drop degenerate rows: a NULL or empty
    embedding would crash every numpy path downstream (np.vstack over a
    batch with None raises) and is meaningless to score. Vectors with
    NaN or NULL ELEMENTS are excluded too, symmetrically with every
    oracle (VEC_BOUNDARY_SQL): NaN poisons dot products into NaN, which
    DuckDB sorts ABOVE all values while numpy kernels rank it -inf and
    ANSI casts of NaN->int raise or wrap — each a guaranteed one-sided
    divergence (review r6; same class ADVICE r4 fixed for
    q_llm_embed_neardup). Every similarity query enters through here,
    so "vectors are non-null, non-empty, finite-or-±inf-free of NULL
    holes" is the family's input boundary; dim-UNIFORMITY across rows
    remains the caller's contract (embedding tables are fixed-dim by
    construction — a ragged table is corrupt input, not an edge
    case)."""
    return (
        df.filter(F.size("embedding") > 0)
        .filter(~F.exists("embedding", lambda x: x.isNull() | F.isnan(x)))
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
    )


def _dot_expr(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _topk_ids(scored: DataFrame, name: str) -> DataFrame:
    """Rank a (qid, vec_id, dot) candidate stream and keep the TOP_K
    ids per query under the ONE canonical tie-break (dot desc, vec_id
    asc). Every recall@k in this module cuts both its exact and its
    approximate side with this function, so a tie-break or TOP_K change
    cannot skew a metric's two sides differently."""
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("qid", F.col("vec_id").alias(name))
    )


def _exact_scored(v: DataFrame, q: DataFrame) -> DataFrame:
    """Brute-force (qid, vec_id, dot) pair stream: queries broadcast,
    corpus never shuffles — the exact tier every ANN variant measures
    its recall against."""
    return v.join(F.broadcast(q), F.col("vec_id") != F.col("qid")).select(
        "qid", "vec_id", _dot_expr("qe", "e").alias("dot")
    )


def _exact_topk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw (qid, vec_id, rk, dot) exact-top-k lineage, un-memoized:
    brute-force scored pairs (queries broadcast, corpus partition-local)
    cut to TOP_K per query under the canonical tie-break. Exists apart
    from _exact_topk_full so scripts/dump_plans.py can capture the real
    physical shape — the memo handle is a checkpoint RDD scan, which
    would hide the BNLJ + window plan the docs gate on."""
    v = _as_double(load(spark, sf_dir, "embeddings"))
    q = v.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    w = Window.partitionBy("qid").orderBy(F.col("dot").desc(), F.col("vec_id"))
    return (
        _exact_scored(v, q)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
    )


def _exact_topk_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (qid, vec_id, rk, dot) ground-truth top-k WITH scores,
    memoized per (live session, sf_dir) exactly like the dedup family's
    pair/label tables (same (path, fingerprint) key, same eviction).

    One brute-force pass serves THREE consumers: the exact tier's own
    output (q_llm_sim_topk projects neighbor/rk/cosine off it) and both
    ANN tiers' recall ground truth. Before r11 the exact tier and the
    recall memo each ran their own N*Q scoring pass — pure repeat work,
    and the duplicated build was charged to q_llm_sim_topk_lsh's bench
    slot (ANN_PAYER_EXACT), which is where its cross-round 1.7-4.9 s
    "noise band" actually lived: the brute-force build is the most
    contention-sensitive stage in the family, and the LSH probe itself
    is ~0.5 s (VERDICT r10 item 2 root cause). The exact tier now pays
    for — and reuses — the one materialization. Handle is a lazy
    localCheckpoint: the first consumer materializes, later consumers
    read blocks."""
    from .dedup import _evict_same_path, _memo, memo_key

    cache = _memo(spark, "_exact_topk_memo")
    key = memo_key(sf_dir)
    if key in cache:
        return cache[key]
    _evict_same_path(cache, key)
    full = _exact_topk_plan(spark, sf_dir).localCheckpoint(eager=False)
    cache[key] = full
    return full


def _exact_topk_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(qid, exact_neighbor) view of the shared ground truth — the
    shape _recall_at_k consumes."""
    return _exact_topk_full(spark, sf_dir).select(
        "qid", F.col("vec_id").alias("exact_neighbor")
    )


def exact_topk_warm(spark: SparkSession, sf_dir: str) -> bool:
    """True iff _exact_topk_ids would be served from the memo (bench
    payer-attribution probe, mirroring dedup.pairs_warm)."""
    from .dedup import memo_key

    return memo_key(sf_dir) in getattr(spark, "_exact_topk_memo", {})


def clear_exact_memo(spark: SparkSession) -> None:
    getattr(spark, "_exact_topk_memo", {}).clear()


def _recall_at_k(exact: DataFrame, approx: DataFrame, name: str) -> DataFrame:
    """Per-query recall@k: the fraction of exact top-k ids the
    approximate tier recovered. ``exact`` carries (qid,
    exact_neighbor), ``approx`` carries (qid, <name>). The exact side's
    qid is renamed before the join: both frames descend from the same
    scan, and leaning on dataset-id disambiguation for a shared-lineage
    self-join invites the trivially-true-predicate trap."""
    e = exact.withColumnRenamed("qid", "eqid")
    return (
        e.join(
            approx,
            (F.col("eqid") == F.col("qid"))
            & (F.col("exact_neighbor") == F.col(name)),
            "left",
        )
        .groupBy(F.col("eqid").alias("qid"))
        # Denominator = the query's ACTUAL exact-neighbor count, not
        # the TOP_K constant: on a corpus slice with fewer than TOP_K
        # vectors a perfect ANN tier would otherwise read as
        # recall < 1.0. (On the fixture every query has >= TOP_K
        # neighbors, so the two denominators coincide there.)
        .agg((F.count(name) / F.count("exact_neighbor")).alias("recall_at_k"))
        .orderBy("qid")
    )


@query(
    "q_llm_sim_topk",
    oracle=f"""
        WITH v AS (
            -- mirrors _as_double's input boundary (VEC_BOUNDARY_SQL):
            -- NULL/empty vectors and NaN/NULL elements are not scored
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
            WHERE {VEC_BOUNDARY_SQL}
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
    """Projects the shared memoized ground truth (_exact_topk_full):
    the exact tier is the natural payer for the one brute-force pass
    the whole ANN family evaluates against. The un-memoized physical
    shape (queries broadcast, corpus partition-local, window top-k) is
    captured from _exact_topk_plan in PLANS.md."""
    return _exact_topk_full(spark, sf_dir).select(
        "qid",
        F.col("vec_id").alias("neighbor"),
        "rk",
        F.round("dot", 6).alias("cosine"),
    )


def _buckets_udf():
    """Multi-table sign-bit LSH bucket ids via seeded random hyperplanes.

    Returns LSH_TABLES bucket ids per vector (one per independent
    hyperplane set). A single hash table has vanishing recall — two
    vectors at angle theta co-bucket with probability (1 - theta/pi)^b,
    ~2% for top-10 neighbors of uniform 64-d vectors at b=8 planes — so
    production LSH always amplifies with an OR over L tables:
    P(candidate) = 1 - (1 - p^b)^L (~85% here with L=24, b=5).
    Measured on this fixture: single-table recall@10 = 0.00; L=12
    recall@10 = 0.60-0.68; L=24 recall@10 = 0.88-0.89 across
    sf0.001/0.01/0.1 — the r11 floor raise doubled L because the
    marginal cost was unmeasurable (candidate generation is an
    Arrow-batched matmul and the scored pair set stays collision-bound).

    The planes tensor is regenerated per batch from the fixed seed so
    executors don't need a broadcast; at real scale broadcast it once.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def buckets(emb: pd.Series) -> pd.Series:
        from sparkstreamingtohdfsofsensorsdata_spark.workerfast import activate

        activate()
        if not len(emb):
            return pd.Series([], dtype=object)
        mat = np.vstack(emb.to_numpy())  # (batch, dim)
        # Plane shape follows the data's dimensionality — a hardcoded
        # dim would shape-mismatch on any non-fixture embedding table.
        rng = np.random.default_rng(LSH_SEED)
        planes = rng.standard_normal((LSH_TABLES, mat.shape[1], LSH_PLANES))
        bits = np.einsum("bd,tdp->tbp", mat, planes) > 0  # (tables, batch, planes)
        vals = (bits * (1 << np.arange(LSH_PLANES))).sum(axis=2)  # (tables, batch)
        return pd.Series(list(vals.astype("int32").T))

    return buckets


def _bound_asserted(recall: DataFrame, floor: float) -> DataFrame:
    """Map a (qid, recall_at_k) frame to the hash-gated contract shape
    both ANN tiers share: one row per query, plus a corpus-wide
    ``mean_recall_ok`` boolean asserting mean recall@k >= the tier's
    floor (LSH_RECALL_FLOOR / IVF_RECALL_FLOOR).

    The seeded-numpy estimates themselves are not SQL-expressible, but
    the CLAIM — "the query set is exactly the boundary-passing strided
    vectors, and the measured mean recall clears the floor" — is: the
    oracle derives the same qid set relationally and asserts the
    boolean literally true, so a recall collapse now breaks the hash
    compare instead of hiding behind a rows-only verdict. The floor is
    on the MEAN, not per-query: on uniform-random fixtures individual
    queries legitimately land at 0 recall.

    The mean rides an unpartitioned window over the per-query frame —
    ONE pass over the recall lineage. The agg + broadcast-crossJoin
    alternative (the q_agg_histogram shape) re-evaluates the whole ANN
    pipeline once per branch (the recall frame is not materialized),
    which doubled the key's bench cost; the single-partition window is
    safe here because the frame is one row per QUERY (tiny by
    construction), never per corpus row.
    """
    w = Window.partitionBy(F.lit(1))
    return recall.select(
        "qid",
        (F.avg("recall_at_k").over(w) >= F.lit(floor)).alias(
            "mean_recall_ok"
        ),
    )


# Shared by both ANN oracles: the qid set is relational even though the
# recall estimate is not.
_ANN_ORACLE = f"""
    SELECT vec_id AS qid, TRUE AS mean_recall_ok
    FROM embeddings
    WHERE {VEC_BOUNDARY_SQL} AND vec_id % {QUERY_STRIDE} = 0
"""


@query(
    "q_llm_sim_topk_lsh",
    oracle=_ANN_ORACLE,
    description="ANN similarity: multi-table random-hyperplane LSH (pandas UDF), mean recall@k floor-asserted vs exact",
    tags=("llm", "similarity", "lsh", "ann"),
)
def q_llm_sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidates = vectors sharing a bucket with the query in ANY of
    the L tables; exact re-rank on the (deduplicated) candidate set.

    At 100 TB the (table, bucket) pair is the shuffle/storage key: the
    corpus-side bucket table is written once, queries probe L buckets
    each, and the scored pair space shrinks from N*Q to the collision
    set. Here the query side is broadcast, so the corpus never shuffles
    at all — candidates are found by an array_contains probe against
    each corpus row's own L bucket ids.
    """
    return _bound_asserted(_lsh_recall(spark, sf_dir), LSH_RECALL_FLOOR)


def _lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query (qid, recall_at_k) for the LSH tier — the measured
    frame q_llm_sim_topk_lsh floor-asserts and tests consume raw."""
    emb = load(spark, sf_dir, "embeddings")
    buckets = _buckets_udf()
    # Buckets are computed on the GUARDED double side (_as_double drops
    # NULL/empty vectors): hashing the raw column would hand np.vstack
    # a batch containing None and crash the UDF. f32 widens to f64
    # exactly, so the sign bits — hence the buckets — are identical.
    v = _as_double(emb).withColumn("buckets", buckets("e"))
    q = v.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("buckets").alias("qbuckets"),
    )

    exact = _exact_topk_ids(spark, sf_dir)
    # Same bucket in any table: elementwise table-i comparison, OR-folded.
    collide = F.exists(
        F.zip_with("buckets", "qbuckets", lambda a, b: a == b), lambda x: x
    )
    approx = _topk_ids(
        v.join(F.broadcast(q), (F.col("vec_id") != F.col("qid")) & collide)
        .select("qid", "vec_id", _dot_expr("qe", "e").alias("dot")),
        "lsh_neighbor",
    )
    return _recall_at_k(exact, approx, "lsh_neighbor")


IVF_NPROBE = 6
IVF_NLIST = 16
IVF_SEED = 7
IVF_LLOYD_ITERS = 2


def _top_cells_udf(cent_rows, k: int):
    """Pandas UDF returning the ``k`` best centroid cells (descending
    dot, ties to the smallest cell) for each vector — the row-local
    centroid scoring that replaces round-3's crossJoin+Window cell
    assignment (an Exchange of 16x the corpus bytes for a per-row
    argmax). The nlist x dim centroid matrix rides in the UDF closure
    (it is collected to the driver every Lloyd round anyway), so each
    Arrow batch is scored with ONE numpy GEMM: zero Exchange, and none
    of the plan-compilation weight of inlining nlist*dim literals into
    every subplan (measured: the literal-array HOF variant more than
    doubled the whole query's wall time on codegen alone). Same
    Arrow-batched-GEMM shape as q_llm_embed_neardup's blocked matmul.

    ``kind="stable"`` argsort over -dot keeps equal-dot cells in
    ascending-cell order — the tie-break the window formulation used.
    """
    from pyspark.sql.functions import pandas_udf

    cmat = np.array(
        [list(r["ce"]) for r in sorted(cent_rows, key=lambda r: r["cell"])]
    )

    @pandas_udf("array<int>")
    def top_cells(e: pd.Series) -> pd.Series:
        from sparkstreamingtohdfsofsensorsdata_spark.workerfast import activate

        activate()
        if not len(e):
            return pd.Series([], dtype=object)
        mat = np.vstack(e.to_numpy())  # (batch, dim)
        order = np.argsort(-(mat @ cmat.T), axis=1, kind="stable")[:, :k]
        return pd.Series(list(order.astype("int32")))

    return top_cells


def _assign_cells(vecs: DataFrame, cent_rows) -> DataFrame:
    """Argmax-dot cell per vector, shuffle-free (see _top_cells_udf)."""
    top1 = _top_cells_udf(cent_rows, 1)
    return vecs.select("vec_id", "e", top1("e")[0].alias("cell"))


def _seed_centroid_rows(v: DataFrame) -> list:
    """Seeded deterministic quantizer init: the IVF_NLIST corpus
    vectors with the smallest xxhash64(vec_id, IVF_SEED) — a uniform
    label-free sample, TakeOrdered of nlist rows, no driver fit. Shared
    by the query and by scripts/dump_plans.py so the captured
    assignment subplan can never drift from the shipped seeding."""
    return (
        v.withColumn("h", F.xxhash64("vec_id", F.lit(IVF_SEED)))
        .orderBy("h")
        .limit(IVF_NLIST)
        .select(
            (F.row_number().over(Window.orderBy("h")) - 1).alias("cell"),
            F.col("e").alias("ce"),
        )
        .collect()
    )


def _recompute_centroids(assigned: DataFrame) -> DataFrame:
    """Spherical-k-means update: per-cell mean, renormalized to unit
    length. posexplode -> (cell, dim) partial averages, so the pass is
    a map-side-combined agg of the corpus scan — never a driver fit."""
    return (
        assigned.select("cell", F.posexplode("e").alias("pos", "val"))
        .groupBy("cell", "pos")
        .agg(F.avg("val").alias("cval"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cval"))).alias("pc"))
        .select("cell", F.transform("pc", lambda s: s.cval).alias("m"))
        .select(
            "cell",
            F.expr(
                "transform(m, x -> x / sqrt(aggregate(m, 0D, (a, y) -> a + y * y)))"
            ).alias("ce"),
        )
    )


@query(
    "q_llm_sim_topk_ivf",
    oracle=_ANN_ORACLE,
    description="IVF ANN: unsupervised spherical-k-means quantizer (seeded init + distributed Lloyd) + nprobe inverted-list search, mean recall@k floor-asserted",
    tags=("llm", "similarity", "ann", "ivf"),
)
def q_llm_sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file ANN, the other production scale path next to LSH.
    Output is the shared bound-asserted contract (see _bound_asserted);
    the raw per-query recall frame lives in _ivf_recall.
    """
    return _bound_asserted(_ivf_recall(spark, sf_dir), IVF_RECALL_FLOOR)


def _ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-file ANN, per-query (qid, recall_at_k).

    1. Coarse quantizer: unsupervised spherical k-means. Init = the
       IVF_NLIST corpus vectors with the smallest xxhash64(vec_id, seed)
       (a deterministic uniform sample — TakeOrdered of nlist rows, no
       driver fit), then IVF_LLOYD_ITERS distributed Lloyd iterations:
       broadcast-join assignment + posexplode partial-average update.
       Between iterations only the nlist x dim centroid scalars touch
       the driver — the standard k-means broadcast round-trip (what
       MLlib's KMeans does); the corpus itself never leaves executors.
       No fixture column (label etc.) is consulted anywhere.
    2. Assign: every vector scores the closure-held nlist x dim
       centroid matrix row-locally (one numpy GEMM per Arrow batch —
       no join, no Exchange) and keeps its argmax-dot cell = its
       inverted list.
    3. Probe: each query scores the same closure-held centroids and
       keeps its IVF_NPROBE best cells; candidates are vectors in
       those lists only, so scored pairs shrink from N*Q to
       ~Q*nprobe*N/nlist.
    4. Exact re-rank within candidates: HOF dot + per-query window
       top-k, identical to the brute-force tier.

    At 100 TB: the quantizer is fit once on a sample and written beside
    the corpus; the corpus-side assignment is one broadcast-join scan
    persisted alongside the vectors (write-once), probes touch only
    nprobe/nlist of the data, and no shuffle moves the corpus — the
    only shuffle is the per-query top-k over already-filtered
    candidates. Returns per-query recall@k against the exact result so
    the accuracy/cost trade is measured, not assumed.
    """
    v = _as_double(load(spark, sf_dir, "embeddings"))

    # Seeded deterministic init: nlist actual corpus vectors (unit norm
    # already), chosen by hash order — reproducible and label-free.
    cent_rows = _seed_centroid_rows(v)
    for _ in range(IVF_LLOYD_ITERS):
        # nlist x dim scalars only — the k-means centroid broadcast
        # round-trip, not a data-path collect.
        cent_rows = _recompute_centroids(_assign_cells(v, cent_rows)).collect()

    assigned = _assign_cells(v, cent_rows)

    # Query-side probe list is row-local too: score the closure-held
    # centroids per query row and explode the best nprobe cells.
    topn = _top_cells_udf(cent_rows, IVF_NPROBE)
    probes = (
        assigned.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            F.explode(topn("e")).alias("probe_cell"),
        )
    )

    candidates = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("qid")),
    ).select("qid", "qe", "vec_id", "e")

    approx = _topk_ids(
        candidates.select("qid", "vec_id", _dot_expr("qe", "e").alias("dot")),
        "ivf_neighbor",
    )

    exact = _exact_topk_ids(spark, sf_dir)
    return _recall_at_k(exact, approx, "ivf_neighbor")


@query(
    "q_llm_embed_quantize",
    oracle=f"""
        WITH v AS (
            -- the similarity family's input boundary (VEC_BOUNDARY_SQL
            -- / _as_double): NULL/empty vectors and NaN/NULL elements
            -- are out — NaN*scale floors to a value ANSI-casts wrap
            -- while DuckDB raises (review r6). The nullif leaves a
            -- ZERO vector as a NULL-scale row instead of a
            -- divide-by-zero (which raises on Spark under ANSI).
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
            WHERE {VEC_BOUNDARY_SQL}
        ),
        scaled AS (
            SELECT vec_id, e,
                   127.0 / nullif(list_max(list_transform(e, x -> abs(x))), 0) AS scale
            FROM v
        ),
        q AS (
            SELECT vec_id,
                   CAST(floor(scale * 1e6 + 0.5) AS BIGINT) AS scale_e6,
                   list_transform(e, x -> CAST(floor(x * scale + 0.5)
                                               AS BIGINT)) AS qv
            FROM scaled
        )
        SELECT vec_id, scale_e6,
               CAST(list_sum(qv) AS BIGINT) AS q_sum,
               list_min(qv)                 AS q_min,
               list_max(qv)                 AS q_max
        FROM q
    """,
    description="Embedding int8 quantization: per-vector symmetric scale, 4x storage cut, integer-exact oracle",
    tags=("llm", "embedding", "quantize"),
)
def q_llm_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization — the standard 4x storage
    and bandwidth cut for ANN indexes (scale = 127/max|x|, round half
    up; no clamp needed because the max maps to exactly +/-127). Pure
    JVM HOFs, row-local, no shuffle at all.

    Determinism contract: float32 widens to double identically on both
    engines, and every output is an INTEGER (scale recorded as
    floor(scale*1e6 + 0.5)) because `round()` on arbitrary doubles is
    the one operation Spark and DuckDB disagree on (see q_merge_scd2).
    """
    v = (
        load(spark, sf_dir, "embeddings")
        # same boundary as _as_double: NULL/empty vectors and NaN/NULL
        # elements are out (symmetric with the oracle — review r6)
        .filter(F.size("embedding") > 0)
        .filter(~F.exists("embedding", lambda x: x.isNull() | F.isnan(x)))
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x AS double))").alias("e"),
        )
    )
    scaled = v.select(
        "vec_id",
        "e",
        # try_divide: the ZERO vector has no scale (NULL row), not an
        # ANSI divide-by-zero task failure
        F.expr(
            "try_divide(127.0, nullif(array_max(transform(e, x -> abs(x))), 0d))"
        ).alias("scale"),
    )
    q = scaled.select(
        "vec_id",
        F.floor(F.col("scale") * 1e6 + 0.5).cast("long").alias("scale_e6"),
        F.expr(
            "transform(e, x -> cast(floor(x * scale + 0.5d) AS bigint))"
        ).alias("qv"),
    )
    return q.select(
        "vec_id",
        "scale_e6",
        F.expr("aggregate(qv, 0L, (acc, x) -> acc + x)").alias("q_sum"),
        F.array_min("qv").alias("q_min"),
        F.array_max("qv").alias("q_max"),
    )


QUANT_CAND = 30  # stage-1 candidate pool per query (3x final k)


@query(
    "q_llm_sim_topk_quant",
    oracle=f"""
        WITH v AS (
            -- boundary: degenerate (NULL/empty/NaN/NULL-element)
            -- vectors per _as_double (VEC_BOUNDARY_SQL), and the ZERO
            -- vector besides — it has no quantization scale (127/0)
            -- and a cosine of 0 against everything.
            SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
            WHERE {VEC_BOUNDARY_SQL}
              AND list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) > 0
        ),
        z AS (
            SELECT vec_id, e,
                   127.0 / list_max(list_transform(e, x -> abs(x))) AS s,
                   list_transform(
                       e, x -> CAST(floor(x * (127.0 / list_max(
                           list_transform(e, y -> abs(y)))) + 0.5) AS BIGINT)
                   ) AS qv
            FROM v
        ),
        q AS (
            SELECT vec_id AS qid, e AS qe, s AS qs, qv AS qqv
            FROM z WHERE vec_id % {QUERY_STRIDE} = 0
        ),
        cand AS (
            SELECT qid, vec_id, qe, e,
                   row_number() OVER (
                       PARTITION BY qid
                       ORDER BY list_dot_product(
                                    CAST(qqv AS DOUBLE[]),
                                    CAST(qv AS DOUBLE[])) / (qs * s) DESC,
                                vec_id) AS rk_a
            FROM q JOIN z ON z.vec_id <> q.qid
        )
        SELECT qid, vec_id AS neighbor, rk,
               round(list_dot_product(qe, e), 6) AS cosine
        FROM (
            SELECT qid, vec_id, qe, e,
                   row_number() OVER (
                       PARTITION BY qid
                       ORDER BY list_dot_product(qe, e) DESC, vec_id) AS rk
            FROM cand WHERE rk_a <= {QUANT_CAND}
        )
        WHERE rk <= {TOP_K}
    """,
    description="Two-stage retrieval: int8-quantized prefilter -> exact cosine re-rank of the candidate pool",
    tags=("llm", "similarity", "topk", "quantize"),
)
def q_llm_sim_topk_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval, the production ANN serving shape: score
    every pair with the int8-quantized vectors (4x less bandwidth;
    SIMD integer dot on real hardware), keep a per-query candidate
    pool, then re-rank only the pool with exact float cosine.

    Engine-exact by construction: the integer dot is exact on both
    engines (products bounded by 127^2 * dim << 2^53), and the
    per-vector dequant scales are single-expression doubles, so the
    stage-1 ranking — ties broken by vec_id — picks identical
    candidate sets everywhere; stage 2 is the same raw-dot ordering
    `q_llm_sim_topk` already relies on. The corpus side never
    shuffles: queries broadcast, both rankings window over the
    (query-bounded) scored side.
    """
    z = (
        _as_double(load(spark, sf_dir, "embeddings"))
        # zero vectors are out (oracle note): no quant scale, cosine 0
        .filter(F.expr("array_max(transform(e, x -> abs(x))) > 0"))
        .select(
            "vec_id",
            "e",
            F.expr("127.0 / array_max(transform(e, x -> abs(x)))").alias("s"),
        )
    )
    z = z.withColumn(
        "qv", F.expr("transform(e, x -> cast(floor(x * s + 0.5d) AS bigint))")
    )
    q = z.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("s").alias("qs"),
        F.col("qv").alias("qqv"),
    )
    pairs = F.broadcast(q).join(z, F.col("vec_id") != F.col("qid"))
    int_dot = F.expr(
        "aggregate(zip_with(qqv, qv, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
    )
    approx = (int_dot / (F.col("qs") * F.col("s"))).alias("approx")
    w1 = Window.partitionBy("qid").orderBy(F.desc("approx"), F.asc("vec_id"))
    cand = (
        pairs.select("qid", "vec_id", "qe", "e", approx)
        .withColumn("rk_a", F.row_number().over(w1))
        .filter(F.col("rk_a") <= QUANT_CAND)
    )
    exact = _dot_expr("qe", "e")
    w2 = Window.partitionBy("qid").orderBy(F.desc("exact"), F.asc("vec_id"))
    return (
        cand.select("qid", "vec_id", "qe", "e", exact.alias("exact"))
        .withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= TOP_K)
        .select(
            "qid",
            F.col("vec_id").alias("neighbor"),
            "rk",
            F.round("exact", 6).alias("cosine"),
        )
    )


PQ_M = 8  # subspaces (dim 64 -> 8 dims per subvector)
PQ_KS = 32  # codes per subspace codebook (5 bits x 8 = 40-bit code)
PQ_SEED = 11
PQ_TRAIN = 512  # sample size for the codebook fit
PQ_FIT_ITERS = 8  # numpy Lloyd iterations on the sample
PQ_CAND = 120  # ADC candidate pool per query before exact re-rank
PQ_NPROBE = 8  # coarse lists probed (IVF uses 6; PQ buys back the ADC loss)
# Measured mean recall@10 (uniform-random fixture, the hardest case):
# 0.80/0.76/0.62 at sf0.001/0.01/0.1 at nprobe=8, pool=120, train=512
# (nprobe=6/pool=50/train=256 measured 0.63/0.62/0.40 — the ADC pool
# was the binding loss at sf0.1). The floor sits ~0.12 under the worst
# measured SF, same margin policy as LSH/IVF (VERDICT r11 item 3 asked
# for >= 0.5).
PQ_RECALL_FLOOR = 0.5


def _pq_fit(v: DataFrame) -> np.ndarray:
    """Per-subspace PQ codebooks, (m, ks, dsub), fit on a seeded
    deterministic sample: the PQ_TRAIN corpus vectors with the
    smallest xxhash64(vec_id, PQ_SEED) — the same label-free
    TakeOrdered sampling the IVF coarse quantizer seeds with — then
    PQ_FIT_ITERS driver-side numpy Lloyd rounds PER SUBSPACE on that
    sample (init = the first PQ_KS sampled subvectors in hash order;
    an emptied code keeps its previous center). The collect is
    PQ_TRAIN x dim doubles — a bounded sample fit, the shape every
    production PQ trainer (faiss, ScaNN) uses: at 100 TB you fit the
    codebook once on a reservoir sample and write it beside the index;
    the corpus itself never participates in training."""
    rows = (
        v.withColumn("h", F.xxhash64("vec_id", F.lit(PQ_SEED)))
        .orderBy("h")
        .limit(PQ_TRAIN)
        .select("e")
        .collect()
    )
    X = np.array([list(r["e"]) for r in rows])  # (n, d)
    n, d = X.shape
    dsub = d // PQ_M
    assert dsub * PQ_M == d, f"dim {d} not divisible into {PQ_M} subspaces"
    sub = X.reshape(n, PQ_M, dsub)
    books = sub[:PQ_KS].transpose(1, 0, 2).copy()  # (m, ks, dsub)
    for _ in range(PQ_FIT_ITERS):
        for s in range(PQ_M):
            xs = sub[:, s]  # (n, dsub)
            d2 = ((xs[:, None, :] - books[s][None]) ** 2).sum(-1)
            assign = d2.argmin(axis=1)  # ties -> lowest code, stable
            for c in range(PQ_KS):
                mask = assign == c
                if mask.any():
                    books[s][c] = xs[mask].mean(axis=0)
    return books


def _pq_codes_udf(books: np.ndarray):
    """Arrow-batched PQ encoder: each vector reshapes to (m, dsub)
    subvectors and takes the argmin-L2 code in its subspace's
    closure-held codebook — one vectorized distance computation per
    batch, zero Exchange (the q_llm_sim_topk_ivf _top_cells_udf
    shape). Row-local and batch-composition-independent, so the codes
    are deterministic under any partitioning."""
    from pyspark.sql.functions import pandas_udf

    m, ks, dsub = books.shape
    b2 = (books**2).sum(-1)  # (m, ks)

    @pandas_udf("array<int>")
    def codes(e: pd.Series) -> pd.Series:
        from sparkstreamingtohdfsofsensorsdata_spark.workerfast import activate

        activate()
        if not len(e):
            return pd.Series([], dtype=object)
        mat = np.vstack(e.to_numpy()).reshape(len(e), m, dsub)
        # ||x - c||^2 = ||c||^2 - 2 x.c (+ ||x||^2, constant per argmin)
        d2 = b2[None] - 2.0 * np.einsum("bmd,mkd->bmk", mat, books)
        return pd.Series(list(d2.argmin(axis=2).astype("int32")))

    return codes


def _pq_qtab_udf(books: np.ndarray):
    """Per-query ADC lookup table, flattened (m*ks) doubles: entry
    [s*ks + c] = dot(query_subvector_s, codebook_s[c]), so the
    asymmetric-distance approximation of dot(q, x) is the sum of m
    table lookups indexed by x's codes — no per-pair float vector math
    at probe time, the classic Jegou ADC trick."""
    from pyspark.sql.functions import pandas_udf

    m, ks, dsub = books.shape

    @pandas_udf("array<double>")
    def qtab(e: pd.Series) -> pd.Series:
        from sparkstreamingtohdfsofsensorsdata_spark.workerfast import activate

        activate()
        if not len(e):
            return pd.Series([], dtype=object)
        mat = np.vstack(e.to_numpy()).reshape(len(e), m, dsub)
        tab = np.einsum("bmd,mkd->bmk", mat, books)  # (b, m, ks)
        return pd.Series(list(tab.reshape(len(e), m * ks)))

    return qtab


@query(
    "q_llm_sim_topk_pq",
    oracle=_ANN_ORACLE,
    description="IVF-PQ ANN: coarse inverted-list probe + per-subspace product-quantization codes ranked by ADC table lookups, exact re-rank of the pool, mean recall@k floor-asserted",
    tags=("llm", "similarity", "ann", "pq"),
)
def q_llm_sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the third ANN tier (VERDICT r11 item 3), the memory-
    bound production shape faiss calls IVFPQ: the coarse quantizer
    prunes WHICH vectors are scored (nprobe inverted lists), PQ codes
    shrink HOW each is scored (m table lookups instead of a d-dim
    float dot), and an exact float re-rank of the small ADC pool
    restores ranking quality. Output is the shared bound-asserted
    contract (_bound_asserted), hash-gated like LSH/IVF."""
    return _bound_asserted(_pq_recall(spark, sf_dir), PQ_RECALL_FLOOR)


def _pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query (qid, recall_at_k) for the IVF-PQ tier.

    1. Coarse quantizer: the SAME seeded spherical k-means as
       q_llm_sim_topk_ivf (shared _seed_centroid_rows /
       _recompute_centroids / _assign_cells) — nlist inverted lists,
       centroid scalars are the only driver round-trip.
    2. PQ codebooks: _pq_fit on a seeded PQ_TRAIN sample; corpus rows
       encode to m int8-range codes row-locally (one Arrow-batched
       argmin GEMM — the 16x-compressed representation that at 100 TB
       is what actually fits in executor memory: 8 bytes/vector
       instead of 256).
    3. Probe: queries keep their PQ_NPROBE best cells (shared
       _top_cells_udf) and carry their flattened ADC table; candidate
       pairs are (cell-collision, not-self) only.
    4. ADC rank: approx dot = sum of m JVM-side table lookups
       (transform-with-index over the codes array — no Python on the
       pair stream); top PQ_CAND per query survive.
    5. Exact re-rank of the pool (HOF dot, canonical tie-break) and
       recall@k against the shared memoized ground truth.

    At 100 TB: codebooks + centroids ship in closures (kilobytes), the
    encoded corpus is written once beside the raw vectors, probes
    touch nprobe/nlist of the lists, and the only shuffle is the
    per-query top-k over collision-bounded candidates."""
    v = _as_double(load(spark, sf_dir, "embeddings"))

    cent_rows = _seed_centroid_rows(v)
    for _ in range(IVF_LLOYD_ITERS):
        cent_rows = _recompute_centroids(_assign_cells(v, cent_rows)).collect()

    books = _pq_fit(v)
    codes = _pq_codes_udf(books)
    assigned = _assign_cells(v, cent_rows).withColumn("codes", codes("e"))

    topn = _top_cells_udf(cent_rows, PQ_NPROBE)
    qtab = _pq_qtab_udf(books)
    probes = (
        v.filter(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("e").alias("qe"),
            qtab("e").alias("qtab"),
            F.explode(topn("e")).alias("probe_cell"),
        )
    )

    candidates = assigned.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("probe_cell")) & (F.col("vec_id") != F.col("qid")),
    )
    # ADC score: m table lookups, JVM-side (transform passes the
    # element AND its index; qtab[i] is 0-based array indexing).
    adc = F.expr(
        f"aggregate(transform(codes, (c, s) -> qtab[s * {PQ_KS} + c]),"
        " 0D, (a, x) -> a + x)"
    )
    w = Window.partitionBy("qid").orderBy(F.desc("adc"), F.asc("vec_id"))
    pool = (
        candidates.select("qid", "qe", "vec_id", "e", adc.alias("adc"))
        .withColumn("rk_a", F.row_number().over(w))
        .filter(F.col("rk_a") <= PQ_CAND)
    )
    approx = _topk_ids(
        pool.select("qid", "vec_id", _dot_expr("qe", "e").alias("dot")),
        "pq_neighbor",
    )
    exact = _exact_topk_ids(spark, sf_dir)
    return _recall_at_k(exact, approx, "pq_neighbor")


@query(
    "q_embed_centroid_stats",
    oracle=f"""
        WITH dims AS (
            SELECT vec_id, label, u.i AS i, u.val AS val
            FROM (
                SELECT vec_id, label,
                       unnest(list_transform(embedding,
                           (x, i) -> struct_pack(i := i,
                                                 val := CAST(x AS DOUBLE)))) AS u
                FROM embeddings
                WHERE {VEC_BOUNDARY_SQL}
            )
        ),
        centroid AS (
            SELECT label, i, avg(val) AS cen
            FROM dims GROUP BY 1, 2
        ),
        cnorm AS (
            SELECT label, sqrt(sum(cen * cen)) AS nc FROM centroid GROUP BY 1
        ),
        cos AS (
            SELECT d.vec_id, d.label,
                   sum(d.val * c.cen)
                     / nullif(sqrt(sum(d.val * d.val)) * any_value(cn.nc), 0)
                       AS cos_c
            FROM dims d
            JOIN centroid c ON d.label = c.label AND d.i = c.i
            JOIN cnorm cn ON d.label = cn.label
            GROUP BY 1, 2
        )
        SELECT cos.label,
               CAST(count(*) AS BIGINT)   AS n_vecs,
               round(avg(cos_c), 6)       AS avg_cos,
               round(min(cos_c), 6)       AS min_cos,
               round(any_value(cn.nc), 6) AS centroid_norm
        FROM cos JOIN cnorm cn ON cos.label = cn.label
        GROUP BY 1
    """,
    description="Embedding-space audit: per-label centroid norm + intra-class cosine coherence",
    tags=("llm", "embedding", "quality"),
)
def q_embed_centroid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit per class label: the centroid's norm
    (uniform-random vectors cancel toward 0; clustered classes keep
    mass) and the distribution of each member's cosine to its own
    centroid (intra-class coherence — the signal that catches a broken
    encoder or mislabeled shard before any training run pays for it).

    Expressed fully relationally — posexplode to (vec, dim, val) rows,
    per-(label, dim) mean, rejoin, dot product as a grouped sum — so
    Catalyst sees ordinary aggregates. The centroid table is
    |labels| x dim rows (tiny) and BROADCASTS back onto the dimension
    stream; norms derive from already-aggregated tables. Inputs pass
    the similarity family's boundary (non-empty, no NaN/NULL holes —
    VEC_BOUNDARY_SQL, same rationale as _as_double), and an all-zero
    vector or all-cancelling centroid yields NULL cosine via nullif on
    both engines, never a 0/0 NaN.

    Scale shape: the wide object (the vector) is exploded once and
    reduced map-side both times; bytes shuffled scale with
    |vectors| x dim for the per-vec reduction and |labels| x dim for
    the centroid — at 100 TB the corpus never moves twice. The
    blocked-GEMM alternative (q_llm_embed_neardup's applyInPandas)
    wins when dim is large and Python/Arrow is warranted; this is the
    pure-JVM form a SQL warehouse would run.
    """
    emb = (
        load(spark, sf_dir, "embeddings")
        .filter(F.size("embedding") > 0)
        .filter(~F.exists("embedding", lambda x: x.isNull() | F.isnan(x)))
    )
    dims = emb.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("pos", "val"),
    ).select(
        "vec_id", "label", (F.col("pos") + 1).alias("i"), F.col("val").cast("double")
    )
    centroid = dims.groupBy("label", "i").agg(F.avg("val").alias("cen"))
    cnorm = centroid.groupBy("label").agg(
        F.sqrt(F.sum(F.col("cen") * F.col("cen"))).alias("nc")
    )
    cos = (
        dims.join(F.broadcast(centroid), ["label", "i"])
        .join(F.broadcast(cnorm), "label")
        .groupBy("vec_id", "label")
        .agg(
            (
                F.sum(F.col("val") * F.col("cen"))
                / F.nullif(
                    F.sqrt(F.sum(F.col("val") * F.col("val")))
                    * F.any_value("nc"),
                    F.lit(0.0),
                )
            ).alias("cos_c")
        )
    )
    return (
        cos.join(F.broadcast(cnorm), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg("cos_c"), 6).alias("avg_cos"),
            F.round(F.min("cos_c"), 6).alias("min_cos"),
            F.round(F.any_value("nc"), 6).alias("centroid_norm"),
        )
    )


@query(
    "q_embed_label_separation",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
            FROM embeddings
            WHERE {VEC_BOUNDARY_SQL} AND label IS NOT NULL
        ),
        ex AS (
            -- parallel unnests zip in DuckDB (range() rejects lateral
            -- column args, so the positions ride a second unnest)
            SELECT vec_id, label,
                   unnest(range(1, len(e) + 1)) AS pos,
                   unnest(e) AS val
            FROM v
        ),
        lcent AS (
            SELECT label, pos, avg(val) AS c FROM ex GROUP BY label, pos
        ),
        gcent AS (
            SELECT pos, avg(val) AS g FROM ex GROUP BY pos
        ),
        lnorm AS (
            SELECT label, sqrt(sum(c * c)) AS cn FROM lcent GROUP BY label
        ),
        gnorm AS (
            SELECT sqrt(sum(g * g)) AS gn FROM gcent
        ),
        dots AS (
            SELECT x.vec_id, x.label,
                   sum(x.val * lc.c) AS dot_own,
                   sum(x.val * gc.g) AS dot_global
            FROM ex x
            JOIN lcent lc ON lc.label = x.label AND lc.pos = x.pos
            JOIN gcent gc ON gc.pos = x.pos
            GROUP BY x.vec_id, x.label
        )
        SELECT d.label,
               CAST(count(*) AS BIGINT)                     AS n_vecs,
               round(avg(d.dot_own / nullif(ln.cn, 0)), 6)  AS cos_own,
               round(avg(d.dot_global / nullif((SELECT gn FROM gnorm), 0)), 6)
                                                            AS cos_global,
               round(avg(d.dot_own / nullif(ln.cn, 0))
                     - avg(d.dot_global / nullif((SELECT gn FROM gnorm), 0)), 6)
                                                            AS separation
        FROM dots d JOIN lnorm ln USING (label)
        GROUP BY d.label
    """,
    description="Embedding label separability: mean cosine to own-label centroid vs global centroid, per label",
    tags=("llm", "embedding", "stats"),
)
def q_embed_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Are the labels real clusters in embedding space? Per label: the
    mean cosine of members to their OWN label centroid vs to the
    GLOBAL centroid (vectors are unit-norm by fixture construction,
    so cosine = dot / |centroid|). separation >> 0 means the label
    structure is geometrically recoverable — the go/no-go check
    before trusting SemDeDup-style semantic clustering or a
    classifier probe on these embeddings.

    Fully relational (the q_embed_centroid_stats pattern): ONE
    posexplode of the vector stream feeds both centroid aggregations
    map-side; the dot products are a join back on (label, pos) /
    (pos) followed by a per-vector sum — no numpy, no driver, no
    all-pairs anything (contrast q_llm_embed_neardup's O(n²) exact
    tier). At 100 TB the exploded stream is dim x n rows of three
    scalars, and every agg combines map-side."""
    base = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("label").isNotNull())
        .filter(F.size("embedding") > 0)
        .filter(~F.exists("embedding", lambda x: x.isNull() | F.isnan(x)))
        .select(
            "vec_id",
            "label",
            F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        )
    )
    ex = base.select(
        "vec_id", "label", F.posexplode("e").alias("pos0", "val")
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "val")
    lcent = ex.groupBy("label", "pos").agg(F.avg("val").alias("c"))
    gcent = ex.groupBy("pos").agg(F.avg("val").alias("g"))
    lnorm = lcent.groupBy("label").agg(
        F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("cn")
    )
    gnorm = gcent.agg(F.sqrt(F.sum(F.col("g") * F.col("g"))).alias("gn"))
    dots = (
        ex.join(F.broadcast(lcent), ["label", "pos"])
        .join(F.broadcast(gcent), ["pos"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("val") * F.col("c")).alias("dot_own"),
            F.sum(F.col("val") * F.col("g")).alias("dot_global"),
        )
    )
    per_label = (
        dots.join(F.broadcast(lnorm), "label")
        .crossJoin(F.broadcast(gnorm))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # a zero-vector label (hostile corpus) has a zero-norm
            # centroid: cosine to it is undefined -> NULL, mirrored with
            # nullif on both engines (ANSI would raise, DuckDB would inf)
            F.avg(
                F.col("dot_own") / F.nullif(F.col("cn"), F.lit(0.0))
            ).alias("a_own"),
            F.avg(
                F.col("dot_global") / F.nullif(F.col("gn"), F.lit(0.0))
            ).alias("a_global"),
        )
    )
    return per_label.select(
        "label",
        "n_vecs",
        F.round("a_own", 6).alias("cos_own"),
        F.round("a_global", 6).alias("cos_global"),
        F.round(F.col("a_own") - F.col("a_global"), 6).alias("separation"),
    )
