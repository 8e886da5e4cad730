"""Deterministic sampling operators (SURVEY.md §2.2 adjunct).

``df.sample(seed=...)`` is NOT reproducible across cluster layouts: the
seed is combined with the partition index, so a repartition — or just a
different file-split plan on a bigger cluster — yields a different
sample. The scale-correct reproducible sample is a pure function of the
ROW (hash of a stable key), which survives any re-partitioning, lets an
independent consumer re-derive the exact same subset, and pushes down
to the scan as an ordinary filter.

The hash here is a lexicographic threshold on the md5 hex prefix — the
same trick the dedup/minhash family uses — so the DuckDB oracle
reproduces the sample bit-for-bit with no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_sample_hash",
    oracle="""
        SELECT o_orderpriority,
               count(*)                                       AS n_sampled,
               CAST(sum(o_orderkey) AS BIGINT)                AS key_sum,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2)    AS price_sum
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
        GROUP BY o_orderpriority
    """,
    description="Deterministic ~10% Bernoulli sample via md5-prefix threshold, aggregated per priority",
    tags=("sample", "filter"),
)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10.2% sample (md5 prefix < 0x1a = 26/256). The predicate is a
    per-row pure function, so the sample is identical on 1 core or
    1000 executors, before or after any shuffle — unlike seeded
    ``df.sample``. The filter sits directly on the scan."""
    o = load(spark, sf_dir, "orders").filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    )
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("o_orderkey").alias("key_sum"),
        F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
    )


@query(
    "q_sample_stratified",
    oracle="""
        SELECT event_type,
               count(*)                                    AS n_sampled,
               CAST(sum(event_id) AS BIGINT)               AS id_sum,
               round(CAST(sum(value) AS DOUBLE), 2)        AS value_sum
        FROM events
        WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) <
              CASE event_type
                   WHEN 'click' THEN '0d'
                   WHEN 'view'  THEN '1a'
                   ELSE '80'
              END
        GROUP BY event_type
    """,
    description="Stratified deterministic sample: per-event-type rates (5%/10%/50%) via md5 threshold",
    tags=("sample", "filter"),
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates — downsample the abundant classes (clicks,
    views) and keep half of everything rare — as ONE scan + filter, the
    distributed form of ``sampleBy``. Same hash-threshold trick, so
    rates are exact-in-expectation and the subset is reproducible."""
    thresh = (
        F.when(F.col("event_type") == "click", F.lit("0d"))
        .when(F.col("event_type") == "view", F.lit("1a"))
        .otherwise(F.lit("80"))
    )
    ev = load(spark, sf_dir, "events").filter(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2) < thresh
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("event_id").alias("id_sum"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


SAMPLE_K_PER_GROUP = 50


@query(
    "q_sample_group_topk",
    oracle=f"""
        SELECT o_orderpriority,
               count(*)                                    AS n_sampled,
               CAST(sum(o_orderkey) AS BIGINT)             AS key_sum,
               round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS price_sum
        FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
                   ) AS rk
            FROM orders
        )
        WHERE rk <= {SAMPLE_K_PER_GROUP}
        GROUP BY o_orderpriority
    """,
    description="Deterministic fixed-k-per-stratum sample: hash-ranked row_number — the reservoir-sample production shape",
    tags=("sample", "window"),
)
def q_sample_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-stratum sampling, the production complement of
    fraction sampling (q_sample_hash/stratified give variable sizes):
    rank each stratum's rows by a pure hash of the stable key and keep
    exactly k — statistically a uniform without-replacement draw, but
    DETERMINISTIC (same sample on 1 core or 1000 executors, re-runnable
    for audits) where a true reservoir sample depends on partition
    visit order. The hash rank, not the raw key, is the order — raw-key
    rank would bias toward early keys.

    At 100 TB: one window shuffle per stratum key. If k is small and
    strata few, the same result is cheaper via TakeOrdered per group
    (rank-k pushdown); Spark's WindowGroupLimit optimization applies
    exactly that pushdown to this rk <= k pattern automatically."""
    from pyspark.sql.window import Window

    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= SAMPLE_K_PER_GROUP)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum("o_orderkey").alias("key_sum"),
            F.round(F.sum("o_totalprice"), 2).alias("price_sum"),
        )
    )


WEIGHTED_PRICE_CAP = 400000.0  # price at which inclusion probability hits 1


@query(
    "q_sample_weighted",
    oracle=f"""
        SELECT o_orderpriority,
               count(*)                                     AS n_sampled,
               CAST(sum(o_orderkey) AS BIGINT)              AS key_sum,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                             AS BIGINT)) AS BIGINT)         AS price_cents_sum
        FROM orders
        WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 6) <
              CASE WHEN o_totalprice >= {WEIGHTED_PRICE_CAP!r} THEN 'zzzzzz'
                   ELSE lpad(lower(to_hex(CAST(floor(
                            o_totalprice / {WEIGHTED_PRICE_CAP!r} * 16777216)
                            AS BIGINT))), 6, '0')
              END
        GROUP BY o_orderpriority
    """,
    description="Weight-proportional (Poisson) deterministic sample: P(keep) = price/cap via md5-vs-scaled-hex threshold",
    tags=("sample", "filter"),
)
def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sampling — P(keep row) = min(1, w/cap) —
    the Poisson-sampling workhorse of importance-weighted pipelines
    (audit high-value orders more, importance-resample training data
    by quality score). Like every sampler in this module it is a PURE
    per-row predicate: the row's md5 unit-hash is compared against its
    OWN weight-scaled threshold, so the sample is reproducible across
    partitionings and engines, and the filter sits on the scan.

    Determinism contract: no libm anywhere — the threshold is
    floor(w/cap * 16^6) rendered as zero-padded lowercase hex and
    compared lexicographically against the md5 prefix (the exact
    integer-compare trick of q_sample_hash, made per-row). Weights at
    or above the cap take the 'zzzzzz' branch (> any hex digit), never
    a 7-digit hex that lpad would truncate into garbage. The
    downstream Horvitz-Thompson estimate divides each kept row by its
    known P(keep); reported sums here stay integer (keys + exact
    cents) so the driver hash is representation-proof.

    Scale shape: scan + filter + map-side-combined agg; zero shuffles
    beyond the group-by exchange. Identical on 1 core or 1000
    executors."""
    o = load(spark, sf_dir, "orders")
    scaled = F.floor(
        F.col("o_totalprice") / WEIGHTED_PRICE_CAP * 16777216
    ).cast("long")
    thresh = F.when(
        F.col("o_totalprice") >= WEIGHTED_PRICE_CAP, F.lit("zzzzzz")
    ).otherwise(F.lpad(F.lower(F.hex(scaled)), 6, "0"))
    kept = o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 6) < thresh
    )
    return kept.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("o_orderkey").alias("key_sum"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("price_cents_sum"),
    )
