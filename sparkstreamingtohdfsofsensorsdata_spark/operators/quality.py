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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load

PRICE_UPPER_BOUND = 1_000_000.0


@query(
    "q_dq_profile",
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


L_DIVERSITY = 3  # the l in distinct-l-diversity


@query(
    "q_anon_ldiversity",
    oracle=f"""
        WITH enriched AS (
            SELECT c.c_mktsegment, c.c_nationkey, o.o_orderpriority
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        classes AS (
            SELECT c_mktsegment, c_nationkey,
                   count(*)                          AS class_rows,
                   count(DISTINCT o_orderpriority)   AS l_distinct
            FROM enriched GROUP BY 1, 2
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT)     AS n_classes,
               CAST(min(l_distinct) AS BIGINT) AS min_l,
               CAST(sum(CASE WHEN l_distinct < {L_DIVERSITY}
                             THEN 1 ELSE 0 END) AS BIGINT)
                                            AS n_classes_low,
               CAST(sum(CASE WHEN l_distinct < {L_DIVERSITY}
                             THEN class_rows ELSE 0 END) AS BIGINT)
                                            AS rows_low_diversity,
               CAST(sum(class_rows) AS BIGINT) AS n_rows
        FROM classes GROUP BY 1
    """,
    description=f"l-diversity audit (l={L_DIVERSITY}): distinct sensitive values per quasi-identifier class, low-diversity exposure per segment",
    tags=("quality", "privacy", "aggregate"),
)
def q_anon_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-l-diversity — the audit k-anonymity (q_anon_kanonymity)
    is famously not enough for: a class can hold k rows yet leak the
    sensitive attribute completely if all k SHARE it (homogeneity
    attack). Rows are orders carrying their customer's quasi-identifier
    tuple (segment, nation); the sensitive attribute is the order
    priority; a class is l-diverse when it contains >= l distinct
    sensitive values. Reported per segment: class count, the worst
    class's diversity, and how many rows sit in under-diverse classes
    — the release blocker a privacy review reads first.

    Scale shape: one co-partitioned orders⋈customer join (both sides
    shuffle on custkey once; at dim-scale the customer side
    broadcasts), then the same two-level agg cascade as k-anonymity —
    count(DISTINCT sensitive) per QI class is a map-side-combined
    partial since the class key bounds the distinct set."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    classes = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("class_rows"),
            F.count_distinct("o_orderpriority").alias("l_distinct"),
        )
    )
    low = F.col("l_distinct") < L_DIVERSITY
    return classes.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("l_distinct").alias("min_l"),
        F.sum(F.when(low, 1).otherwise(0)).alias("n_classes_low"),
        F.sum(F.when(low, F.col("class_rows")).otherwise(0)).alias(
            "rows_low_diversity"
        ),
        F.sum("class_rows").alias("n_rows"),
    )


DQ_QTY_MAX = 45.0  # quantity rule upper bound
DQ_PRICE_MAX = 100000.0  # extendedprice rule upper bound
DQ_DISC_MAX = 0.08  # discount rule upper bound
DQ_SHIP_CUTOFF = "2001-01-01"  # shipdate freshness rule


@query(
    "q_dq_rules",
    oracle=f"""
        WITH row_rules AS (
            SELECT
                count(*) AS n,
                sum(CASE WHEN l_quantity < 1 OR l_quantity > {DQ_QTY_MAX!r}
                         THEN 1 ELSE 0 END) AS v_qty,
                sum(CASE WHEN l_extendedprice <= 0
                              OR l_extendedprice > {DQ_PRICE_MAX!r}
                         THEN 1 ELSE 0 END) AS v_price,
                sum(CASE WHEN l_discount < 0 OR l_discount > {DQ_DISC_MAX!r}
                         THEN 1 ELSE 0 END) AS v_disc,
                sum(CASE WHEN l_shipdate IS NULL
                              OR l_shipdate >= TIMESTAMP '{DQ_SHIP_CUTOFF}'
                         THEN 1 ELSE 0 END) AS v_ship
            FROM lineitem
        ),
        ref AS (
            SELECT count(*) AS v_orphan
            FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)
        )
        SELECT rule, n_checked, n_violations,
               CAST((n_violations * 1000000) // n_checked AS BIGINT)
                   AS viol_micros
        FROM (
            SELECT 'discount_bounded' AS rule,
                   CAST(n AS BIGINT) AS n_checked,
                   CAST(v_disc AS BIGINT) AS n_violations FROM row_rules
            UNION ALL
            SELECT 'orderkey_referential', CAST(r2.n AS BIGINT),
                   CAST(v_orphan AS BIGINT)
            FROM ref, row_rules r2
            UNION ALL
            SELECT 'price_in_range', CAST(n AS BIGINT),
                   CAST(v_price AS BIGINT) FROM row_rules
            UNION ALL
            SELECT 'quantity_in_range', CAST(n AS BIGINT),
                   CAST(v_qty AS BIGINT) FROM row_rules
            UNION ALL
            SELECT 'shipdate_fresh', CAST(n AS BIGINT),
                   CAST(v_ship AS BIGINT) FROM row_rules
        )
    """,
    description="Declarative data-quality rule pack over lineitem: range/null/referential rules with violation rates",
    tags=("quality", "aggregate", "join"),
)
def q_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ rule evaluation — the contract-enforcement pass
    a pipeline runs before promoting a batch: four row-local range /
    nullability rules evaluated in ONE scan (each a conditional sum,
    so adding a rule is free), plus one referential-integrity rule
    (every lineitem points at an existing order) as a left-anti
    probe. Output is one row per rule with checked/violation counts
    and the violation rate in integer micros — the shape a quality
    gate thresholds on and a dashboard trends.

    Scale shape: the row-local rules share a single
    map-side-combined full scan regardless of rule count; the
    referential rule shuffles lineitem once against orders (or
    bloom-prunes at the scan under AQE). Nothing quadratic, nothing
    per-rule."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey")
    row_rules = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(
                (F.col("l_quantity") < 1) | (F.col("l_quantity") > DQ_QTY_MAX), 1
            ).otherwise(0)
        ).alias("v_qty"),
        F.sum(
            F.when(
                (F.col("l_extendedprice") <= 0)
                | (F.col("l_extendedprice") > DQ_PRICE_MAX),
                1,
            ).otherwise(0)
        ).alias("v_price"),
        F.sum(
            F.when(
                (F.col("l_discount") < 0) | (F.col("l_discount") > DQ_DISC_MAX), 1
            ).otherwise(0)
        ).alias("v_disc"),
        F.sum(
            F.when(
                F.col("l_shipdate").isNull()
                | (F.col("l_shipdate") >= F.lit(DQ_SHIP_CUTOFF).cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("v_ship"),
    )
    orphans = (
        li.select("l_orderkey")
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("v_orphan"))
    )
    combined = row_rules.crossJoin(orphans)  # 1 row x 1 row
    rules = combined.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("discount_bounded").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_disc").alias("n_violations"),
                ),
                F.struct(
                    F.lit("orderkey_referential").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_orphan").alias("n_violations"),
                ),
                F.struct(
                    F.lit("price_in_range").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_price").alias("n_violations"),
                ),
                F.struct(
                    F.lit("quantity_in_range").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_qty").alias("n_violations"),
                ),
                F.struct(
                    F.lit("shipdate_fresh").alias("rule"),
                    F.col("n").alias("n_checked"),
                    F.col("v_ship").alias("n_violations"),
                ),
            )
        ).alias("r")
    )
    return rules.select(
        F.col("r.rule").alias("rule"),
        F.col("r.n_checked").cast("long").alias("n_checked"),
        F.col("r.n_violations").cast("long").alias("n_violations"),
        F.expr("(r.n_violations * 1000000) div r.n_checked")
        .cast("long")
        .alias("viol_micros"),
    )


# Benford first-digit expectation, parts-per-million: round(log10(1 +
# 1/d) * 1e6). Precomputed CONSTANTS inlined into both engines — never
# computed with log10 at query time, where a last-ulp libm difference
# between JVM and DuckDB would break the exact hash.
BENFORD_PPM = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()
) + " END"
_BENFORD_SPARK_CASE = (
    "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}L" for d, p in BENFORD_PPM.items()
    ) + " END"
)


@query(
    "q_dq_benford",
    oracle=f"""
        WITH v AS (
            SELECT CAST(substr(CAST(CAST(floor(o_totalprice * 100 + 0.5)
                       AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders
            WHERE o_totalprice > 0
        ),
        c AS (
            SELECT digit, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(count(*)) OVER () AS BIGINT) AS total
            FROM v GROUP BY digit
        )
        SELECT digit, n,
               CAST(n * 1000000 // total AS BIGINT) AS obs_ppm,
               CAST({_BENFORD_SQL_CASE} AS BIGINT)  AS exp_ppm,
               CAST(abs(n * 1000000 // total - ({_BENFORD_SQL_CASE}))
                    AS BIGINT)                      AS dev_ppm
        FROM c
    """,
    description="Benford first-digit conformance audit on order totals: observed vs expected digit frequency in exact integer ppm (expectation inlined as constants — no query-time libm)",
    tags=("quality", "aggregate", "audit"),
)
def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice against
    Benford's law — the classic fabricated-data / unit-mixing screen a
    pipeline runs over money columns before trusting a new feed. The
    digit is taken from the exact integer-cents rendering (bigint ->
    string, identical in both engines — never from double formatting);
    frequencies and deviations are BIGINT floor-division ppm. One
    map-side-combinable aggregation over a 9-row result; the total
    rides a 9-row unpartitioned window, not a second scan."""
    v = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
    )
    c = v.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    c = c.withColumn(
        "total", F.sum("n").over(Window.partitionBy(F.lit(1)))
    )
    return c.select(
        "digit",
        "n",
        F.expr("(n * 1000000) div total").cast("long").alias("obs_ppm"),
        F.expr(_BENFORD_SPARK_CASE).cast("long").alias("exp_ppm"),
        F.abs(
            F.expr("(n * 1000000) div total")
            - F.expr(_BENFORD_SPARK_CASE)
        )
        .cast("long")
        .alias("dev_ppm"),
    )


# t-closeness distance threshold (micros): classes whose ordered-EMD
# from the global sensitive-attribute distribution exceeds this leak
# distributional information k-anonymity and l-diversity both miss.
T_CLOSENESS_MICROS = 250000


@query(
    "q_anon_tcloseness",
    oracle=f"""
        WITH j AS (
            SELECT c.c_mktsegment AS seg, c.c_nationkey AS nat,
                   o.o_orderpriority AS pri
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderpriority IS NOT NULL
        ),
        pri_vals AS (SELECT DISTINCT pri FROM j),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM pri_vals),
        g AS (
            SELECT pri, CAST(count(*) AS BIGINT) AS n_g FROM j GROUP BY pri
        ),
        gtot AS (SELECT CAST(count(*) AS BIGINT) AS ng FROM j),
        classes AS (
            SELECT seg, nat, CAST(count(*) AS BIGINT) AS nc
            FROM j GROUP BY seg, nat
        ),
        grid AS (
            SELECT c.seg, c.nat, c.nc, p.pri,
                   CAST(coalesce(x.n, 0) AS BIGINT) AS n_c
            FROM classes c
            CROSS JOIN pri_vals p
            LEFT JOIN (
                SELECT seg, nat, pri, count(*) AS n FROM j GROUP BY 1, 2, 3
            ) x ON x.seg = c.seg AND x.nat = c.nat AND x.pri = p.pri
        ),
        cums AS (
            SELECT seg, nat, nc, pri,
                   sum(n_c) OVER (PARTITION BY seg, nat ORDER BY pri) AS cum_c,
                   (SELECT sum(g2.n_g) FROM g g2 WHERE g2.pri <= grid.pri)
                       AS cum_g
            FROM grid
        ),
        dist AS (
            SELECT seg, nat, nc,
                   CAST(CASE WHEN (SELECT m FROM m) > 1
                        THEN sum(abs(cum_c * (SELECT ng FROM gtot)
                                     - cum_g * nc)) * 1000000
                             // (nc * (SELECT ng FROM gtot)
                                 * ((SELECT m FROM m) - 1))
                        END AS BIGINT)
                       AS t_micros
            FROM cums GROUP BY seg, nat, nc
        )
        SELECT seg,
               CAST(count(*) AS BIGINT)   AS n_classes,
               CAST(max(t_micros) AS BIGINT) AS worst_t_micros,
               CAST(sum(CASE WHEN t_micros > {T_CLOSENESS_MICROS}
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_far_classes,
               CAST(sum(CASE WHEN t_micros > {T_CLOSENESS_MICROS}
                             THEN nc ELSE 0 END) AS BIGINT) AS rows_exposed
        FROM dist GROUP BY seg
    """,
    description="t-closeness audit (ordered EMD between each QI class's sensitive distribution and the global one, exact cross-multiplied BIGINT micros) — the distribution-leak gate k-anonymity and l-diversity miss",
    tags=("quality", "privacy", "aggregate"),
)
def q_anon_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the privacy-audit family (k-anonymity: class sizes;
    l-diversity: distinct sensitive values; t-closeness: the
    DISTRIBUTION of the sensitive value inside each class vs the
    table). For the ordinal priority attribute the Earth-Mover
    distance is the mean absolute difference of cumulative
    distributions — computed here entirely in cross-multiplied BIGINTs
    (|cum_c*N_g - cum_g*N_c| summed, one floor division at the end),
    so the audit number is hash-exact.

    Scale shape: one orders-by-customer equi-join (the l-diversity
    join), one groupBy per granularity (class, class x value, value),
    and the class x value grid is a crossJoin of two SMALL distinct
    sets (classes x ordinal values) left-joined to counts — grid
    construction is O(classes x values) regardless of input rows. The
    per-class cumulative rides a window over m ordinal values, bounded
    by construction."""
    j = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isNotNull())
        .join(
            load(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_nationkey").alias("nat"),
            F.col("o_orderpriority").alias("pri"),
        )
    )
    pri_vals = j.select("pri").distinct()
    classes = j.groupBy("seg", "nat").agg(F.count(F.lit(1)).alias("nc"))
    cls_counts = j.groupBy("seg", "nat", "pri").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_g = Window.orderBy("pri").rowsBetween(Window.unboundedPreceding, 0)
    glob = (
        j.groupBy("pri")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .withColumn("cum_g", F.sum("n_g").over(w_g))
    )
    ng = j.agg(F.count(F.lit(1)).alias("ng"))
    m = pri_vals.agg(F.count(F.lit(1)).alias("m"))
    grid = (
        classes.crossJoin(F.broadcast(pri_vals))
        .join(cls_counts, ["seg", "nat", "pri"], "left")
        .select(
            "seg", "nat", "nc", "pri", F.coalesce("n", F.lit(0)).alias("n_c")
        )
    )
    w_c = (
        Window.partitionBy("seg", "nat")
        .orderBy("pri")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cums = (
        grid.withColumn("cum_c", F.sum("n_c").over(w_c))
        .join(F.broadcast(glob.select("pri", "cum_g")), "pri")
        .crossJoin(F.broadcast(ng))
        .crossJoin(F.broadcast(m))
    )
    # ng and m are global 1-row constants broadcast onto every grid row
    # — constant within any group, so they join the grouping key rather
    # than needing a fake aggregate around them
    # m > 1 guard (ADVICE r11): a fixture whose sensitive attribute has
    # a single distinct value makes the (m - 1) normalizer zero and both
    # engines raise division-by-zero; a one-value distribution has zero
    # EMD everywhere, so t_micros must read NULL-not-crash, mirroring
    # the vwap/herfindahl guard class. Guarded identically in the
    # oracle above.
    dist = cums.groupBy("seg", "nat", "nc", "ng", "m").agg(
        F.expr(
            "cast(case when m > 1 then"
            " sum(abs(cum_c * ng - cum_g * nc)) * 1000000"
            " div (nc * ng * (m - 1)) end as bigint)"
        ).alias("t_micros")
    )
    return dist.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.max("t_micros").alias("worst_t_micros"),
        F.sum(
            F.when(F.col("t_micros") > T_CLOSENESS_MICROS, 1).otherwise(0)
        ).alias("n_far_classes"),
        F.sum(
            F.when(F.col("t_micros") > T_CLOSENESS_MICROS, F.col("nc")).otherwise(
                0
            )
        ).alias("rows_exposed"),
    )


# PSI contract: 10 fixed-width value buckets (width 50 over the
# fixture's [0, 500) value range, top bucket open), reference period =
# days before the split date, current = the rest. Laplace 0.5
# smoothing keeps empty buckets finite exactly as monitoring systems
# ship it.
PSI_SPLIT_DAY = "2024-01-16"
PSI_BUCKET_W = 50
PSI_BUCKETS = 10


@query(
    "q_dq_psi",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   CASE WHEN CAST(ts AS DATE) < DATE '{PSI_SPLIT_DAY}'
                        THEN 0 ELSE 1 END AS period,
                   least(CAST(floor(value / {PSI_BUCKET_W}) AS INT),
                         {PSI_BUCKETS - 1}) AS bucket,
                   CAST(count(*) AS BIGINT) AS c
            FROM events
            GROUP BY 1, 2, 3
        ),
        grid AS (
            SELECT et.event_type, gs.bucket,
                   coalesce(r.c, 0) AS c_ref,
                   coalesce(u.c, 0) AS c_cur
            FROM (SELECT DISTINCT event_type FROM b) et
            CROSS JOIN (SELECT unnest(range({PSI_BUCKETS})) AS bucket) gs
            LEFT JOIN b r ON r.event_type = et.event_type
                         AND r.bucket = gs.bucket AND r.period = 0
            LEFT JOIN b u ON u.event_type = et.event_type
                         AND u.bucket = gs.bucket AND u.period = 1
        ),
        tot AS (
            SELECT event_type, bucket, c_ref, c_cur,
                   sum(c_ref) OVER (PARTITION BY event_type) AS n_ref,
                   sum(c_cur) OVER (PARTITION BY event_type) AS n_cur
            FROM grid
        )
        SELECT event_type,
               CAST(max(n_ref) AS BIGINT) AS n_ref,
               CAST(max(n_cur) AS BIGINT) AS n_cur,
               round(sum(
                   ((c_ref + 0.5) / (n_ref + {PSI_BUCKETS} * 0.5)
                    - (c_cur + 0.5) / (n_cur + {PSI_BUCKETS} * 0.5))
                   * ln(((c_ref + 0.5) / (n_ref + {PSI_BUCKETS} * 0.5))
                        / ((c_cur + 0.5) / (n_cur + {PSI_BUCKETS} * 0.5)))
               ), 6) AS psi
        FROM tot
        GROUP BY event_type
    """,
    description="Population Stability Index per event_type: 10 fixed-width value buckets, Laplace-smoothed reference-vs-current distributions, the drift score model-monitoring systems alert on",
    tags=("quality", "drift", "audit"),
)
def q_dq_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI — THE production drift metric (scorecard monitoring's
    standard: <0.1 stable, 0.1-0.25 drifting, >0.25 act): compares the
    value distribution before/after a split date over fixed buckets,
    sum((p-q)*ln(p/q)). Buckets are integer-exact; the only floats are
    the final smoothed ratios and one ln per bucket, summed over a
    FIXED 10-bucket grid (explicitly densified with zero counts so
    both engines sum the same 10 terms — a missing empty bucket would
    silently change the score) and rounded to 6 dp like q_llm_entropy
    (drift ~1e-15 against a 1e-6 grid).

    Scale shape: one map-side-combined (type, period, bucket) count —
    a ~100-row table no matter the input size; the grid densify, the
    window totals, and the PSI fold all run on that tiny table. No
    Python, no data-sized window."""
    b = (
        load(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.when(
                F.col("ts").cast("date") < F.lit(PSI_SPLIT_DAY).cast("date"),
                0,
            )
            .otherwise(1)
            .alias("period"),
            F.least(
                F.floor(F.col("value") / PSI_BUCKET_W).cast("int"),
                F.lit(PSI_BUCKETS - 1),
            ).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    et = b.select("event_type").distinct()
    grid = et.crossJoin(
        F.broadcast(
            b.sparkSession.range(PSI_BUCKETS).select(
                F.col("id").cast("int").alias("bucket")
            )
        )
    )
    ref = b.filter(F.col("period") == 0).select(
        "event_type", "bucket", F.col("c").alias("c_ref")
    )
    cur = b.filter(F.col("period") == 1).select(
        "event_type", "bucket", F.col("c").alias("c_cur")
    )
    g = (
        grid.join(ref, ["event_type", "bucket"], "left")
        .join(cur, ["event_type", "bucket"], "left")
        .fillna(0, subset=["c_ref", "c_cur"])
    )
    w = Window.partitionBy("event_type")
    tot = g.select(
        "event_type",
        "bucket",
        "c_ref",
        "c_cur",
        F.sum("c_ref").over(w).alias("n_ref"),
        F.sum("c_cur").over(w).alias("n_cur"),
    )
    smooth = PSI_BUCKETS * 0.5
    p = (F.col("c_ref") + 0.5) / (F.col("n_ref") + smooth)
    q = (F.col("c_cur") + 0.5) / (F.col("n_cur") + smooth)
    return tot.groupBy("event_type").agg(
        F.max("n_ref").alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
    )


# Generalization ladder for the k-anonymity release decision: each
# level coarsens BOTH quasi-identifiers (user bucket, time grain).
ANON_LADDER_K = 5


@query(
    "q_anon_generalize",
    oracle=f"""
        WITH rows_qi AS (
            SELECT user_id, CAST(ts AS DATE) AS day FROM events
        ),
        lvl AS (
            SELECT 0 AS level, user_id % 1024 AS qi_user,
                   CAST(day AS VARCHAR) AS qi_time
            FROM rows_qi
            UNION ALL
            SELECT 1, user_id % 128,
                   CAST(date_trunc('week', day) AS VARCHAR)
            FROM rows_qi
            UNION ALL
            SELECT 2, user_id % 16,
                   CAST(date_trunc('month', day) AS VARCHAR)
            FROM rows_qi
        ),
        cls AS (
            SELECT level, qi_user, qi_time,
                   CAST(count(*) AS BIGINT) AS sz
            FROM lvl GROUP BY 1, 2, 3
        )
        SELECT level,
               CAST(count(*) AS BIGINT)  AS n_classes,
               CAST(min(sz) AS BIGINT)   AS min_class,
               CAST(sum(CASE WHEN sz < {ANON_LADDER_K} THEN sz ELSE 0 END)
                    AS BIGINT)           AS n_suppressed,
               CAST(CASE WHEN min(sz) >= {ANON_LADDER_K} THEN 1 ELSE 0 END
                    AS INT)              AS meets_k
        FROM cls
        GROUP BY level
    """,
    description="k-anonymity generalization ladder: three coarsening levels of the (user bucket, time grain) quasi-identifier pair, per-level class counts / suppression cost / k-compliance — the release-decision table",
    tags=("quality", "privacy", "audit"),
)
def q_anon_generalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decision table behind a k-anonymous release:
    q_anon_kanonymity AUDITS one quasi-identifier choice; real privacy
    reviews walk a generalization LADDER (coarsen user bucket 1024 →
    128 → 16 and time day → week → month) and pick the first level
    whose minimum class size clears k, trading utility (n_classes)
    against suppression cost (rows in classes still under k). All
    integer counts; week/month grains via date_trunc, which both
    engines define identically (ISO Monday weeks).

    Scale shape: one union of three map-side-combined groupBys over
    (bucketed) quasi-identifiers — level cardinality caps at
    1024 x days, 128 x weeks, 16 x months — then a 3-row fold.
    No window, no Python, no skew (bucketing is modular)."""
    rows_qi = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    levels = [
        (0, F.col("user_id") % 1024, F.col("day").cast("string")),
        (
            1,
            F.col("user_id") % 128,
            F.date_trunc("week", "day").cast("date").cast("string"),
        ),
        (
            2,
            F.col("user_id") % 16,
            F.date_trunc("month", "day").cast("date").cast("string"),
        ),
    ]
    lvl = None
    for level, qi_user, qi_time in levels:
        part = rows_qi.select(
            F.lit(level).alias("level"),
            qi_user.alias("qi_user"),
            qi_time.alias("qi_time"),
        )
        lvl = part if lvl is None else lvl.unionAll(part)
    cls = lvl.groupBy("level", "qi_user", "qi_time").agg(
        F.count(F.lit(1)).alias("sz")
    )
    return cls.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.min("sz").alias("min_class"),
        F.sum(
            F.when(F.col("sz") < ANON_LADDER_K, F.col("sz")).otherwise(0)
        ).alias("n_suppressed"),
        F.when(F.min("sz") >= ANON_LADDER_K, 1)
        .otherwise(0)
        .cast("int")
        .alias("meets_k"),
    )


@query(
    "q_dq_freshness",
    oracle="""
        WITH mx AS (
            SELECT max(epoch_us(ts)) AS gmax_us FROM events
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT)          AS n_events,
               CAST(max(epoch_us(ts)) AS BIGINT) AS last_us,
               CAST((mx.gmax_us - max(epoch_us(ts))) // 1000000
                    AS BIGINT)                   AS lag_s,
               CAST(sum(CASE WHEN epoch_us(ts)
                                  >= mx.gmax_us - CAST(86400 AS BIGINT) * 1000000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_last_day,
               CAST(CASE WHEN (mx.gmax_us - max(epoch_us(ts))) // 1000000
                              > 3600
                         THEN 1 ELSE 0 END AS INT) AS stale
        FROM events, mx
        GROUP BY event_type, mx.gmax_us
    """,
    description="Feed freshness audit: per-stream last-seen timestamp, lag behind the corpus head in exact seconds, last-24h volume, staleness flag — the first data-quality page of any ingestion dashboard",
    tags=("quality", "freshness", "audit"),
)
def q_dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion freshness — "is every feed still alive, and how far
    behind the head is it?": per event_type the last event, its lag
    behind the global maximum timestamp in whole seconds, the last-24h
    event count, and an hour-threshold staleness flag. The canonical
    first check on a streaming-to-storage pipeline's output tables.
    All integer microseconds; the lag floor-divides AFTER the
    subtraction so both engines truncate the same difference.

    Scale shape: one map-side-combined per-type aggregation plus a
    1-row global max broadcast back (crossJoin-a-scalar idiom) — the
    24h window predicate folds into the same single pass as a
    conditional sum, so the table is scanned once. No window, no
    Python."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us")
    )
    gmax = ev.agg(F.max("us").alias("gmax_us"))
    per = ev.crossJoin(F.broadcast(gmax)).groupBy("event_type", "gmax_us").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("us").alias("last_us"),
        F.sum(
            F.when(F.col("us") >= F.col("gmax_us") - 86400 * 1_000_000, 1)
            .otherwise(0)
        ).alias("n_last_day"),
    )
    return per.select(
        "event_type",
        "n_events",
        "last_us",
        F.expr("(gmax_us - last_us) div 1000000").alias("lag_s"),
        "n_last_day",
        F.expr(
            "cast(case when (gmax_us - last_us) div 1000000 > 3600"
            " then 1 else 0 end as int)"
        ).alias("stale"),
    )


# Seeded-noise DP release: epsilon and the md5-derived uniform are part
# of the pinned contract — "reproducible audit mode", where the noise is
# a deterministic function of (release_tag, group key) so two engines
# (and two re-runs of the same release) agree bit-for-bit.
DP_EPSILON_INV = 2.0  # Laplace scale b = 1/epsilon (epsilon = 0.5)
DP_RELEASE_TAG = "r12"


@query(
    "q_anon_dp_counts",
    oracle=f"""
        WITH c AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n
            FROM events
            GROUP BY 1, 2
        ),
        u AS (
            SELECT event_type, day, n,
                   (CAST(('0x' || substring(
                        md5('{DP_RELEASE_TAG}' || event_type || day), 1, 8))
                        AS BIGINT) + 0.5) / 4294967296.0 - 0.5 AS uni
            FROM c
        )
        SELECT event_type, day, n,
               round(n - {DP_EPSILON_INV}
                     * CASE WHEN uni < 0 THEN -1.0 ELSE 1.0 END
                     * ln(1.0 - 2.0 * abs(uni)), 6) AS noisy_n
        FROM u
    """,
    description="Differentially-private count release (reproducible audit mode): per-(event_type, day) counts + Laplace(1/eps) noise from a seeded md5-uniform via inverse-CDF — bit-reproducible across engines and re-runs",
    tags=("quality", "privacy", "audit"),
)
def q_anon_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DP-release mechanics (Laplace mechanism on count queries,
    sensitivity 1, b = 1/epsilon) in REPRODUCIBLE AUDIT MODE: the
    uniform driving the inverse-CDF comes from md5(tag || group key),
    so an auditor — or a second engine — re-derives the exact same
    noise. A production release would swap the seeded uniform for a
    CSPRNG draw; everything else (the inverse-CDF transform
    -b*sign(u)*ln(1-2|u|), the epsilon bookkeeping) is the deployment
    code path. The md5 32-bit slice (8 hex chars, normalized by 2^32)
    is exact in both engines; the one
    ln rounds at 6 dp like q_llm_entropy.

    Scale shape: one map-side-combined (type, day) count, then pure
    per-row scalar arithmetic — noise needs no shuffle at all."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    uni = (
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(DP_RELEASE_TAG),
                            F.col("event_type"),
                            F.col("day").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            + 0.5
        )
        / 4294967296.0
        - 0.5
    )
    noisy = F.col("n") - DP_EPSILON_INV * F.when(
        F.col("uni") < 0, -1.0
    ).otherwise(1.0) * F.log(1.0 - 2.0 * F.abs(F.col("uni")))
    return (
        c.withColumn("uni", uni)
        .withColumn("noisy_n", F.round(noisy, 6))
        .select("event_type", "day", "n", "noisy_n")
    )


@query(
    "q_dq_referential",
    oracle="""
        WITH rel AS (
            SELECT 'orders->customer' AS relationship,
                   CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child,
                   CAST((SELECT count(*) FROM orders o
                         WHERE NOT EXISTS (SELECT 1 FROM customer c
                                           WHERE c.c_custkey = o.o_custkey))
                        AS BIGINT) AS n_orphan
            UNION ALL
            SELECT 'lineitem->orders',
                   CAST((SELECT count(*) FROM lineitem) AS BIGINT),
                   CAST((SELECT count(*) FROM lineitem l
                         WHERE NOT EXISTS (SELECT 1 FROM orders o
                                           WHERE o.o_orderkey = l.l_orderkey))
                        AS BIGINT)
            UNION ALL
            SELECT 'lineitem->part',
                   CAST((SELECT count(*) FROM lineitem) AS BIGINT),
                   CAST((SELECT count(*) FROM lineitem l
                         WHERE NOT EXISTS (SELECT 1 FROM part p
                                           WHERE p.p_partkey = l.l_partkey))
                        AS BIGINT)
            UNION ALL
            SELECT 'customer->nation',
                   CAST((SELECT count(*) FROM customer) AS BIGINT),
                   CAST((SELECT count(*) FROM customer c
                         WHERE NOT EXISTS (SELECT 1 FROM nation n
                                           WHERE n.n_nationkey = c.c_nationkey))
                        AS BIGINT)
        )
        SELECT relationship, n_child, n_orphan,
               CAST(n_orphan * 1000000 // n_child AS BIGINT) AS orphan_ppm
        FROM rel
    """,
    description="Referential-integrity audit across the star schema's four foreign keys: anti-join orphan counts + orphan rate in exact ppm — the cross-table DQ page q_dq_rules' single-table checks can't see",
    tags=("quality", "integrity", "audit"),
)
def q_dq_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key integrity over the whole star schema: for each
    child->parent relationship, how many child rows have no parent
    (left-anti join count) and the orphan rate in exact ppm. This is
    the first page of any warehouse DQ report and the one class
    q_dq_rules (single-table nulls/ranges) structurally cannot catch;
    broken ingestion almost always shows up here first (partial
    parent loads, late dimensions).

    Scale shape: each relationship is ONE left-anti hash join — the
    parent key side aggregates to distinct keys first and broadcasts
    when small (nation/customer), shuffles co-partitioned otherwise;
    counts fold map-side. The four relationships union into a 4-row
    table. No window, no Python."""
    rels = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child, ck, parent, pk in rels:
        c = load(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        orphans = c.join(p, "k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan")
        )
        total = c.agg(F.count(F.lit(1)).alias("n_child"))
        row = (
            total.crossJoin(orphans)
            .select(
                F.lit(name).alias("relationship"),
                "n_child",
                "n_orphan",
                F.expr("n_orphan * 1000000 div n_child").alias("orphan_ppm"),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


PSEUD_TAG = "pseud-v1:"  # key/version of the pseudonymization secret
PSEUD_LEN = 16  # 64-bit hex surrogate


@query(
    "q_anon_pseudonym",
    oracle=f"""
        WITH c AS (
            SELECT c_mktsegment,
                   substring(md5('{PSEUD_TAG}' || CAST(c_custkey AS VARCHAR)),
                             1, {PSEUD_LEN}) AS pseud
            FROM customer
        ),
        o AS (
            SELECT substring(md5('{PSEUD_TAG}' || CAST(o_custkey AS VARCHAR)),
                             1, {PSEUD_LEN}) AS pseud,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders
        )
        SELECT c.c_mktsegment,
               CAST(count(DISTINCT c.pseud) AS BIGINT) AS n_pseudonyms,
               CAST(count(o.pseud) AS BIGINT)          AS n_orders,
               CAST(coalesce(sum(o.cents), 0) AS BIGINT) AS revenue_cents
        FROM c LEFT JOIN o ON o.pseud = c.pseud
        GROUP BY c.c_mktsegment
    """,
    description="Keyed deterministic pseudonymization with referential integrity: customer ids replaced by keyed-md5 surrogates in BOTH tables, join re-linked on the pseudonym alone, revenue per segment proves linkage survives",
    tags=("quality", "privacy", "join"),
)
def q_anon_pseudonym(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudonymization done the way a data-sharing agreement requires
    (r13): the raw identifier is REPLACED by a keyed surrogate
    (md5 over a versioned secret tag || id, truncated to 64 bits), the
    SAME function applied to every table that carries the id — so
    analysts can still join customers to orders, but only through the
    surrogate. Complements q_llm_pii_redact (free-text scrubbing) and
    the q_anon_* suite (aggregate-release guarantees): this is the
    record-level-release primitive. The per-segment aggregate proves
    the two properties that make pseudonymization useful:
    n_pseudonyms == segment customer count (injectivity at this scale;
    a collision would shrink it) and revenue linked via surrogates
    equals revenue linked via raw keys (referential integrity — the
    oracle computes the same join on its own surrogates).

    A production release swaps md5(tag||id) for HMAC with a managed
    secret; everything else — per-table surrogate projection, the
    join topology, the injectivity audit — is the deployment shape.

    Scale shape: surrogate derivation is a per-row projection (no
    shuffle); the join shuffles on the surrogate exactly as it would
    on the raw key (same cardinality, same skew); the audit rides the
    aggregation already being paid."""
    c = load(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.substring(
            F.md5(F.concat(F.lit(PSEUD_TAG), F.col("c_custkey").cast("string"))),
            1,
            PSEUD_LEN,
        ).alias("pseud"),
    )
    o = load(spark, sf_dir, "orders").select(
        F.substring(
            F.md5(F.concat(F.lit(PSEUD_TAG), F.col("o_custkey").cast("string"))),
            1,
            PSEUD_LEN,
        ).alias("pseud"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias(
            "cents"
        ),
    )
    joined = c.join(o, "pseud", "left")
    return joined.groupBy("c_mktsegment").agg(
        F.countDistinct("pseud").alias("n_pseudonyms"),
        F.count(o["cents"]).alias("n_orders"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("revenue_cents"),
    )
