"""Data-quality constraint profiling (Deequ-style, SURVEY.md §2
training-pipeline extensions): declarative checks — completeness,
uniqueness, range bounds, accepted values — evaluated in ONE pass over
the table and emitted as a (constraint, value, passed) verdict table.

The single-pass shape is the point at scale: a naive DQ harness runs
one scan per constraint; at 100 TB over 6 constraints that is 6 scans
of the fact table. Here every metric is an algebraic aggregate
composed into ONE .agg() — one scan, map-side partials, a 1-row
result — and the per-constraint verdict rows are exploded from that
single row, driver-free. The one distinct aggregate (uniqueness) is
what forces Spark's mixed-distinct rewrite (Expand over the gid
column); that doubles the scanned-row stream for the agg but is still
one scan — the standard trade every single-pass profiler (Deequ
included) makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

PRICE_UPPER_BOUND = 1_000_000.0


@query(
    "q_dq_profile",
    float_dp={"value": 4},
    oracle=f"""
        WITH m AS (
            SELECT count(*)                                AS c,
                   count(o_orderpriority)                  AS cp,
                   count(DISTINCT o_orderkey)              AS cd,
                   min(o_totalprice)                       AS mn,
                   max(o_totalprice)                       AS mx,
                   sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                            THEN 1 ELSE 0 END)             AS viol
            FROM orders
        )
        SELECT * FROM (
            SELECT 'accepted_values_o_orderstatus' AS constraint,
                   round(CAST(viol AS DOUBLE), 6)  AS value,
                   viol = 0                        AS passed
            FROM m
            UNION ALL
            SELECT 'completeness_o_orderpriority',
                   round(cp / CAST(c AS DOUBLE), 6),
                   cp = c
            FROM m
            UNION ALL
            SELECT 'max_o_totalprice_bounded',
                   round(mx, 6),
                   mx <= {PRICE_UPPER_BOUND!r}
            FROM m
            UNION ALL
            SELECT 'min_o_totalprice_nonneg',
                   round(mn, 6),
                   mn >= 0
            FROM m
            UNION ALL
            SELECT 'row_count_nonzero',
                   round(CAST(c AS DOUBLE), 6),
                   c > 0
            FROM m
            UNION ALL
            SELECT 'uniqueness_o_orderkey',
                   round(cd / CAST(c AS DOUBLE), 6),
                   cd = c
            FROM m
        )
    """,
    description="Deequ-style single-pass data-quality constraint suite over orders",
    tags=("dq", "agg", "profile"),
)
def q_dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over ``orders``: six declarative checks
    (non-empty, completeness, key uniqueness, min/max range bounds,
    accepted-values) evaluated from ONE aggregation pass and unpivoted
    into a verdict table via explode-of-structs — the same shape a
    training-data pipeline runs nightly before promoting a snapshot.

    Engine notes: every `value` is emitted as DOUBLE (counts included)
    so the verdict column is one homogeneous type on both engines;
    ratios round at 6 dp; `passed` is computed from the UNROUNDED
    aggregate on both sides, so a 0.9999996 completeness fails even
    though its displayed value rounds to 1.0.

    Scale shape: one scan; all six metrics are algebraic aggregates in
    a single .agg() (map-side partials; the lone distinct aggregate
    triggers Spark's mixed-distinct Expand rewrite — still one scan,
    see module docstring); the unpivot explodes a 1-row frame, so the
    verdict construction is free at any scale.
    """
    orders = load(spark, sf_dir, "orders")
    m = orders.agg(
        F.count(F.lit(1)).alias("c"),
        F.count("o_orderpriority").alias("cp"),
        F.count_distinct(F.col("o_orderkey")).alias("cd"),
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        ).alias("viol"),
    )

    def verdict(name: str, value, passed):
        return F.struct(
            F.lit(name).alias("constraint"),
            F.round(value.cast("double"), 6).alias("value"),
            passed.alias("passed"),
        )

    return m.select(
        F.explode(
            F.array(
                verdict(
                    "accepted_values_o_orderstatus",
                    F.col("viol"),
                    F.col("viol") == 0,
                ),
                verdict(
                    "completeness_o_orderpriority",
                    F.col("cp") / F.col("c"),
                    F.col("cp") == F.col("c"),
                ),
                verdict(
                    "max_o_totalprice_bounded",
                    F.col("mx"),
                    F.col("mx") <= PRICE_UPPER_BOUND,
                ),
                verdict(
                    "min_o_totalprice_nonneg",
                    F.col("mn"),
                    F.col("mn") >= 0,
                ),
                verdict("row_count_nonzero", F.col("c"), F.col("c") > 0),
                verdict(
                    "uniqueness_o_orderkey",
                    F.col("cd") / F.col("c"),
                    F.col("cd") == F.col("c"),
                ),
            )
        ).alias("r")
    ).select("r.constraint", "r.value", "r.passed")


K_ANON = 5  # the k in k-anonymity
ACCTBAL_BUCKET = 1000.0  # generalization step for the continuous QI


@query(
    "q_anon_kanonymity",
    oracle=f"""
        WITH classes AS (
            SELECT c_mktsegment,
                   c_nationkey,
                   CAST(floor(c_acctbal / {ACCTBAL_BUCKET}) AS BIGINT) AS bal_bucket,
                   count(*) AS class_size
            FROM customer
            GROUP BY 1, 2, 3
        )
        SELECT c_mktsegment,
               CAST(sum(class_size) AS BIGINT)  AS n_rows,
               CAST(count(*) AS BIGINT)         AS n_classes,
               CAST(sum(CASE WHEN class_size < {K_ANON}
                             THEN class_size ELSE 0 END) AS BIGINT)
                                                AS n_rows_at_risk,
               round(sum(CASE WHEN class_size < {K_ANON}
                              THEN class_size ELSE 0 END) * 1.0
                     / sum(class_size), 6)      AS risk_frac
        FROM classes GROUP BY c_mktsegment
    """,
    float_dp={"risk_frac": 6},
    description=f"k-anonymity audit (k={K_ANON}) over generalized quasi-identifiers, per-segment re-identification risk",
    tags=("quality", "privacy", "aggregate"),
)
def q_anon_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy audit for training-data release: group rows by their
    generalized quasi-identifier tuple (market segment, nation,
    account-balance bucket) and report, per segment, how many rows sit
    in equivalence classes smaller than k — the rows an adversary
    joining public attributes could re-identify. The generalization
    step (balance bucketed to {bucket}) is the knob a release pipeline
    widens until risk_frac hits its budget.

    Scale shape: one map-side-combined groupBy on the QI tuple, then a
    per-segment roll-up of class sizes — the same two-level agg
    cascade as q_graph_degree; no join, no window, no Python. At
    100 TB the QI cardinality (|segments| x |nations| x |buckets|) is
    bounded, so the second agg is trivially small.
    """
    classes = (
        load(spark, sf_dir, "customer")
        .groupBy(
            "c_mktsegment",
            "c_nationkey",
            F.floor(F.col("c_acctbal") / ACCTBAL_BUCKET)
            .cast("long")
            .alias("bal_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    at_risk = F.when(F.col("class_size") < K_ANON, F.col("class_size")).otherwise(
        F.lit(0)
    )
    return classes.groupBy("c_mktsegment").agg(
        F.sum("class_size").alias("n_rows"),
        F.count(F.lit(1)).alias("n_classes"),
        F.sum(at_risk).alias("n_rows_at_risk"),
        F.round(F.sum(at_risk) / F.sum("class_size"), 6).alias("risk_frac"),
    )


q_anon_kanonymity.__doc__ = q_anon_kanonymity.__doc__.format(
    bucket=int(ACCTBAL_BUCKET)
)
