"""Join operators (SURVEY.md §2.3).

Scale notes baked into each query:

- Equi-joins shuffle both sides on the key unless one side is broadcast.
  Dimension tables (region/nation/supplier/part at TPC-H ratios) are
  broadcast explicitly — at 100 TB the fact table never moves.
- Non-equi (theta/range) joins have no hash path; unconstrained they are
  cartesian. Every non-equi join here is bounded by an equi component
  (band join per user) or by provably tiny inputs (region x nation).
- The as-of join is implemented as union + window "last non-null", the
  merge-asof formulation: one shuffle on (user), no range explosion —
  this is the form that survives 1000 executors, unlike a range join
  whose per-key pair count grows quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import load


@query(
    "q_join_inner_equi",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        WHERE o.o_totalprice > 100000
    """,
    description="Hash/sort-merge equi-join (Catalyst picks the physical strategy)",
    tags=("join",),
)
def q_join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return c.join(o, c.c_custkey == o.o_custkey, "inner").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
        SELECT l.l_orderkey, l.l_quantity, p.p_name, p.p_brand, s.s_name
        FROM lineitem l
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE p.p_size <= 5 AND l.l_quantity >= 40
    """,
    description="Map-side broadcast join: fact table never shuffles",
    tags=("join", "broadcast"),
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 40)
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = load(spark, sf_dir, "supplier")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .select("l_orderkey", "l_quantity", "p_name", "p_brand", "s_name")
    )


@query(
    "q_join_left",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    description="Left outer join (null-extended right side)",
    tags=("join", "outer"),
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000)
    return c.join(o, cond, "left").select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "q_join_right",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
        FROM orders o
        RIGHT JOIN customer c
          ON c.c_custkey = o.o_custkey AND o.o_totalprice > 400000
    """,
    description="Right outer join",
    tags=("join", "outer"),
)
def q_join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000)
    return o.join(c, cond, "right").select("o_orderkey", "o_totalprice", "c_custkey", "c_name")


@query(
    "q_join_full",
    oracle="""
        WITH cust_per_nation AS (
            SELECT c_nationkey AS nationkey, count(*) AS n_cust
            FROM customer WHERE c_acctbal > 9000 GROUP BY 1
        ),
        supp_per_nation AS (
            SELECT s_nationkey AS nationkey, count(*) AS n_supp
            FROM supplier WHERE s_acctbal > 9000 GROUP BY 1
        )
        SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
               c.n_cust, s.n_supp
        FROM cust_per_nation c
        FULL OUTER JOIN supp_per_nation s ON c.nationkey = s.nationkey
    """,
    description="Full outer join of two aggregated sides (nulls on both sides)",
    tags=("join", "outer"),
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = cust.alias("c").join(
        supp.alias("s"), F.col("c.nationkey") == F.col("s.nationkey"), "full"
    )
    return joined.select(
        F.coalesce(F.col("c.nationkey"), F.col("s.nationkey")).alias("nationkey"),
        F.col("c.n_cust").alias("n_cust"),
        F.col("s.n_supp").alias("n_supp"),
    )


@query(
    "q_join_semi",
    oracle="""
        SELECT c_custkey, c_name, c_acctbal
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
    """,
    description="Left-semi join (EXISTS): probe side streamed, no row duplication",
    tags=("join", "semi"),
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
    """,
    description="Left-anti join (NOT EXISTS)",
    tags=("join", "anti"),
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "q_join_cross",
    oracle="""
        SELECT r.r_name, n.n_name,
               CASE WHEN n.n_regionkey = r.r_regionkey THEN 1 ELSE 0 END AS is_home
        FROM region r
        CROSS JOIN nation n
    """,
    description="Cross join (bounded: 5 x 25 rows)",
    tags=("join", "cross"),
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name",
        "n_name",
        F.when(F.col("n_regionkey") == F.col("r_regionkey"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_home"),
    )


@query(
    "q_join_theta",
    oracle="""
        SELECT s.s_suppkey, s.s_name, n.n_nationkey, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey < n.n_nationkey
        WHERE n.n_nationkey <= 5
    """,
    description="Non-equi theta join (broadcast nested-loop; small side broadcast)",
    tags=("join", "theta"),
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") <= 5)
    # Only a nested-loop strategy can evaluate '<' — broadcast the tiny side
    # so the big side never shuffles.
    return s.join(F.broadcast(n), s.s_nationkey < n.n_nationkey, "inner").select(
        "s_suppkey", "s_name", "n_nationkey", "n_name"
    )


@query(
    "q_join_range",
    oracle="""
        SELECT a.event_id AS left_id,
               b.event_id AS right_id,
               a.user_id
        FROM events a
        JOIN events b
          ON a.user_id = b.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 10 MINUTE
        WHERE a.event_type = 'purchase'
    """,
    description="Band (range) join bounded by an equi key: pairs within 10min per user",
    tags=("join", "range"),
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi component (user_id) makes this a hash join with a
    residual range filter — per-key pair count stays bounded, which is
    what keeps it viable at 100 TB (a pure range join would be
    quadratic). events.ts is us-aligned so Spark/DuckDB agree exactly."""
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 10 MINUTES"))
    )
    return a.join(b, cond, "inner").select(
        F.col("a.event_id").alias("left_id"),
        F.col("b.event_id").alias("right_id"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "q_join_asof",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS purchase_ts,
               (SELECT v.event_id FROM events v
                 WHERE v.user_id = p.user_id
                   AND v.event_type = 'view'
                   AND v.ts <= p.ts
                 ORDER BY v.ts DESC, v.event_id DESC
                 LIMIT 1) AS asof_view_id
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    description="As-of join (merge-asof): latest view at-or-before each purchase per user",
    tags=("join", "asof"),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable as-of: union both sides with a tag, one window sorted by
    (ts, tag, id) per user, carry the last non-null view id forward.
    One shuffle on user_id, linear state — no range-join explosion.
    Tie rule (matches oracle): views at the same ts as the purchase are
    visible; among equal-ts views the max event_id wins.
    """
    ev = load(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    return asof_join(views, purchases).select(
        "event_id",
        "user_id",
        F.date_trunc("second", F.col("ts")).alias("purchase_ts"),
        "asof_view_id",
    )


def asof_join(views: DataFrame, purchases: DataFrame) -> DataFrame:
    """Union-window as-of core (see q_join_asof): ``views`` is
    ``(user_id, ts, view_event_id)``, ``purchases`` is ``(user_id, ts,
    event_id)``; returns every purchase row plus ``asof_view_id`` = the
    view at-or-before it per user (equal-ts views visible, max id wins
    ties). Property-tested against a brute-force per-purchase argmax in
    tests/test_properties.py on arbitrary tie patterns."""
    v = views.select(
        "user_id", "ts", "view_event_id",
        F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
    )
    p = purchases.select(
        "user_id", "ts", F.lit(None).cast("long").alias("view_event_id"),
        F.lit(1).alias("side"), "event_id",
    )
    # side=0 (view) sorts before side=1 (purchase) at equal ts -> inclusive
    # "at-or-before"; view_event_id as final key -> max id wins ties.
    merged = v.unionByName(p)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "view_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = merged.withColumn(
        "asof_view_id", F.last("view_event_id", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("side") == 1).select(
        "user_id", "ts", "event_id", "asof_view_id"
    )


N_SALT = 8


@query(
    "q_join_skew_salted",
    oracle="""
        SELECT n.n_name,
               count(*)                                 AS n_events,
               round(CAST(sum(e.value) AS DOUBLE), 2)   AS value_sum
        FROM events e
        JOIN nation n
          ON n.n_nationkey = CASE WHEN e.event_id % 4 <> 0
                                  THEN 0 ELSE e.user_id % 25 END
        GROUP BY n.n_name
    """,
    description="Skew-salted shuffle join: hot key spread over 8 salt buckets, dim exploded to match",
    tags=("join", "skew", "salt"),
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salting for skewed shuffle joins: 75% of fact rows share one hot
    key (a degenerate sensor/user in the reference's telemetry), which
    would land on ONE reducer in a plain shuffle join. The fix layered
    here:

    - fact side gains `salt = event_id % 8` (pure, uniform),
    - dim side is exploded x8 so every (key, salt) pair exists,
    - the join key becomes (key, salt) -> the hot key now spreads over
      8 reducers; aggregation after the join is unaffected.

    The first fix for a SMALL dim is broadcast (no shuffle, no skew) —
    the `shuffle_hash` hint below simulates the case where the dim
    exceeds broadcast budget, which is when salting earns its keep.
    AQE's skew-join split handles moderate skew on sort-merge joins
    automatically; explicit salting is the deterministic form that also
    works for aggregations and streaming state."""
    ev = load(spark, sf_dir, "events")
    fact = ev.select(
        "event_id",
        "value",
        F.when(F.col("event_id") % 4 != 0, F.lit(0))
        .otherwise(F.col("user_id") % 25)
        .cast("int")
        .alias("skew_key"),
        (F.col("event_id") % N_SALT).cast("int").alias("salt"),
    )
    dim = (
        load(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1))))
    )
    joined = fact.join(
        dim.hint("shuffle_hash"),
        (fact.skew_key == dim.n_nationkey) & (fact.salt == dim.salt),
        "inner",
    )
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("value_sum"),
    )


@query(
    "q_join_interval_overlap",
    oracle="""
        WITH iv AS (
            SELECT user_id,
                   CAST(ts AS DATE)                 AS d,
                   min(date_trunc('second', ts))    AS lo,
                   max(date_trunc('second', ts))    AS hi
            FROM events
            GROUP BY user_id, CAST(ts AS DATE)
        )
        SELECT a.d AS event_date,
               count(*)                             AS n_overlap_pairs,
               count(DISTINCT a.user_id)            AS n_left_users
        FROM iv a JOIN iv b
          ON a.d = b.d AND a.user_id < b.user_id
         AND a.lo <= b.hi AND b.lo <= a.hi
        GROUP BY a.d
    """,
    description="Interval-overlap join: per-day user activity intervals, overlap rides the day equi key",
    tags=("join", "interval", "timeseries"),
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval joins (overlapping time ranges) are the third member
    of the inequality-join family next to q_join_range (point-in-band)
    and q_join_asof (latest-at-or-before). The scale rule is the same
    for all three: NEVER ship the inequality to the join — carry the
    join on an equi key that buckets the data (the DAY here; coarser
    or finer grids tune selectivity), and apply the overlap test
    [a.lo <= b.hi AND b.lo <= a.hi] as a residual filter inside the
    matched bucket. Intervals spanning bucket boundaries are handled
    in production by emitting one row per covered bucket and
    deduplicating matches — the fixture's per-day intervals cannot
    span by construction.

    Timestamps are compared at SECOND precision via date_trunc — the
    fixture's parquet carries ns timestamps that Spark truncates to
    micros while DuckDB keeps ns, so raw min/max comparisons would be
    a guaranteed one-sided divergence (tables._normalize_ts note)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("d"),
        F.date_trunc("second", F.col("ts")).alias("s"),
    )
    iv = ev.groupBy("user_id", "d").agg(
        F.min("s").alias("lo"), F.max("s").alias("hi")
    )
    a, b = iv.alias("a"), iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.lo") <= F.col("b.hi"))
            & (F.col("b.lo") <= F.col("a.hi")),
        )
        .groupBy(F.col("a.d").alias("event_date"))
        .agg(
            F.count(F.lit(1)).alias("n_overlap_pairs"),
            F.countDistinct(F.col("a.user_id")).alias("n_left_users"),
        )
    )


@query(
    "q_join_null_safe",
    oracle="""
        WITH a AS (
            SELECT nullif(user_id % 10, 3) AS cohort, count(*) AS clicks
            FROM events WHERE event_type = 'click' GROUP BY 1
        ),
        b AS (
            SELECT nullif(user_id % 10, 3) AS cohort, count(*) AS purchases
            FROM events WHERE event_type = 'purchase' GROUP BY 1
        )
        SELECT a.cohort AS cohort_a, b.cohort AS cohort_b,
               a.clicks, b.purchases
        FROM a FULL OUTER JOIN b ON a.cohort IS NOT DISTINCT FROM b.cohort
    """,
    description="Null-safe equi join (<=> / IS NOT DISTINCT FROM) over nullable keys",
    tags=("join", "null"),
)
def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``<=>`` treats NULL as a joinable value: the NULL cohort rows on
    the two sides pair up instead of falling out (a plain ``=`` full
    outer join would emit two unmatched rows). Spark hashes EqualNullSafe
    keys like any other — NULL gets a partition — so this stays a normal
    shuffled (or broadcast) hash join at 100 TB, NOT a nested-loop
    fallback; that is the practical reason to prefer ``<=>`` over
    ``coalesce(k, sentinel) =`` rewrites, which corrupt real sentinel
    values. Both cohort columns are projected so the output proves the
    pairing (NULL, NULL) happened on the join, not in a later coalesce."""
    ev = load(spark, sf_dir, "events")
    cohort = F.nullif(F.col("user_id") % 10, F.lit(3)).alias("cohort")
    a = (
        ev.filter(F.col("event_type") == "click")
        .select(cohort)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("clicks"))
        .alias("a")
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .select(cohort)
        .groupBy("cohort")
        .agg(F.count(F.lit(1)).alias("purchases"))
        .alias("b")
    )
    return a.join(
        b, F.col("a.cohort").eqNullSafe(F.col("b.cohort")), "full_outer"
    ).select(
        F.col("a.cohort").alias("cohort_a"),
        F.col("b.cohort").alias("cohort_b"),
        "clicks",
        "purchases",
    )


@query(
    "q_join_asof_nearest",
    oracle="""
        SELECT p.event_id,
               p.user_id,
               CAST(date_trunc('second', p.ts) AS TIMESTAMP) AS purchase_ts,
               (SELECT v.event_id FROM events v
                 WHERE v.user_id = p.user_id
                   AND v.event_type = 'view'
                 ORDER BY
                   abs(CAST(epoch(date_trunc('second', v.ts)) AS BIGINT)
                       - CAST(epoch(date_trunc('second', p.ts)) AS BIGINT)),
                   (date_trunc('second', v.ts) > date_trunc('second', p.ts)),
                   v.event_id DESC
                 LIMIT 1) AS nearest_view_id
        FROM events p
        WHERE p.event_type = 'purchase'
    """,
    description="Nearest-direction as-of join: closest view in EITHER direction, backward wins ties",
    tags=("join", "asof"),
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas ``merge_asof(direction='nearest')`` semantics at Spark
    scale: the nearest view is necessarily one of {closest at-or-before,
    closest at-or-after}, so two union-window passes (the q_join_asof
    carry, run once forward and once on negated epochs) produce both
    candidates with their timestamps, and a row-local CASE picks the
    smaller second-grain distance — backward preferred on exact ties,
    max event_id within equal-ts views (both passes share that rule, so
    a zero-distance tie resolves identically either way). Cost: two
    shuffles on user_id and a cheap self-join keyed by the unique
    purchase event_id — never a range-join explosion. All distances are
    BIGINT seconds from second-truncated instants: exact arithmetic,
    and immune to the fixture's ns-vs-us precision split (SURVEY §1.3)."""
    ev = load(spark, sf_dir, "events")
    sec = F.date_trunc("second", F.col("ts"))
    t = F.unix_timestamp(sec).alias("t")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", t, F.col("event_id").alias("view_event_id")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", t, "event_id", sec.alias("purchase_ts")
    )

    def _directional(vdf: DataFrame, pdf: DataFrame, flip: bool) -> DataFrame:
        sign = -1 if flip else 1
        v = vdf.select(
            "user_id", (sign * F.col("t")).alias("ot"), "view_event_id",
            F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
        )
        p = pdf.select(
            "user_id", (sign * F.col("t")).alias("ot"),
            F.lit(None).cast("long").alias("view_event_id"),
            F.lit(1).alias("side"), "event_id",
        )
        w = (
            Window.partitionBy("user_id")
            .orderBy("ot", "side", "view_event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = v.unionByName(p).select(
            "side", "event_id",
            F.last("view_event_id", ignorenulls=True).over(w).alias("cand_id"),
            F.last(
                F.when(F.col("side") == 0, F.col("ot")), ignorenulls=True
            ).over(w).alias("cand_ot"),
        )
        return carried.filter(F.col("side") == 1).select(
            "event_id",
            F.col("cand_id").alias("back_id" if not flip else "fwd_id"),
            (sign * F.col("cand_ot")).alias("back_t" if not flip else "fwd_t"),
        )

    back = _directional(views, purchases, flip=False)
    fwd = _directional(views, purchases, flip=True)
    both = purchases.join(back, "event_id", "left").join(fwd, "event_id", "left")
    back_diff = F.col("t") - F.col("back_t")
    fwd_diff = F.col("fwd_t") - F.col("t")
    return both.select(
        "event_id",
        "user_id",
        "purchase_ts",
        F.when(F.col("back_id").isNull(), F.col("fwd_id"))
        .when(F.col("fwd_id").isNull(), F.col("back_id"))
        .when(fwd_diff < back_diff, F.col("fwd_id"))
        .otherwise(F.col("back_id"))
        .alias("nearest_view_id"),
    )


BLOOM_CONFS = {
    # Runtime bloom filters only fire when broadcast is off the table —
    # at 100 TB the filtered dim is selective but NOT driver-small, the
    # exact regime the rewrite exists for. Thresholds are floored so
    # the fixture (tiny by design) still exercises the production plan.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
}


import contextlib


@contextlib.contextmanager
def bloom_confs_scoped(spark: SparkSession):
    """Set BLOOM_CONFS for the duration of the block and restore the
    caller's values on exit (unset-if-absent) — the single owner of the
    save/restore subtlety, shared by the query and its plan gate."""
    saved = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _bloom_join_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy join plan q_join_bloom_runtime materializes (split out
    so the plan gate can snapshot it under the same confs)."""
    li = load(spark, sf_dir, "lineitem")
    pt = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 97 == 0)
    return (
        li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_join_bloom_runtime",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT)       AS n,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_partkey % 97 = 0
        GROUP BY l_returnflag
    """,
    description="Runtime bloom-filter join: selective non-broadcastable dim prunes the fact scan side",
    tags=("join", "bloom", "runtime-filter"),
)
def q_join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's InjectRuntimeFilter rewrite, exercised end-to-end: when a
    selective dim is too big to broadcast, Spark builds a bloom filter
    from the dim's join keys and inserts might_contain() on the FACT
    side, so ~99% of fact rows die before the shuffle instead of
    crossing the wire to be dropped by the join. At 100 TB this is the
    difference between shuffling the whole fact table and shuffling
    the ~1% that can match — the single biggest lever on selective
    star joins after broadcast itself.

    The rewrite happens at OPTIMIZATION time, which for a lazy
    DataFrame is collect time — so the confs are scoped with
    try/finally around an EAGER localCheckpoint materialization (the
    run_to_memory pattern): the returned frame carries the
    bloom-filtered result, and no conf leaks into the next query's
    plan (autoBroadcastJoinThreshold=-1 would wreck every broadcast
    key in the registry).

    The result is conf-independent (same rows with or without the
    filter — a bloom false positive only wastes a probe, never adds a
    row), which is what the plain-join oracle checks.
    """
    with bloom_confs_scoped(spark):
        return _bloom_join_frame(spark, sf_dir).localCheckpoint(eager=True)


ASOF_TOLERANCE_MIN = 15  # max staleness a reading may carry


@query(
    "q_join_asof_tolerance",
    oracle=f"""
        WITH matched AS (
            SELECT p.event_id, p.user_id, p.ts,
                   (SELECT v.event_id FROM events v
                     WHERE v.user_id = p.user_id
                       AND v.event_type = 'view'
                       AND v.ts <= p.ts
                       AND v.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                     ORDER BY v.ts DESC, v.event_id DESC
                     LIMIT 1) AS asof_view_id,
                   (SELECT v.ts FROM events v
                     WHERE v.user_id = p.user_id
                       AND v.event_type = 'view'
                       AND v.ts <= p.ts
                       AND v.ts >= p.ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
                     ORDER BY v.ts DESC, v.event_id DESC
                     LIMIT 1) AS vts
            FROM events p
            WHERE p.event_type = 'purchase'
        )
        SELECT event_id, user_id, asof_view_id,
               CAST(epoch_us(ts) - epoch_us(vts) AS BIGINT) // 1000000
                   AS staleness_s
        FROM matched
    """,
    description=f"As-of join with a staleness tolerance ({ASOF_TOLERANCE_MIN}m): stale readings report NULL, matched ones their exact lag",
    tags=("join", "asof", "tolerance"),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sensor-fusion as-of: each purchase takes the latest view
    at-or-before it ONLY if that reading is fresher than the
    tolerance — beyond it the match is NULL (merge_asof's `tolerance`
    parameter; the rule that stops a 3-day-old sensor reading from
    silently fusing into the record). Same union-window core as
    q_join_asof (one user_id shuffle, linear state, no range
    explosion) carrying the matched ts alongside the id; the
    tolerance test and the exact integer-microsecond staleness are
    row-local afterthoughts. An out-of-tolerance match NULLs the id
    but keeps the row — the consumer decides whether stale means
    drop or impute."""
    ev = load(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_event_id"),
        F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("view_ts"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("long").alias("view_event_id"),
        F.lit(1).alias("side"), "event_id",
        F.lit(None).cast("timestamp").alias("view_ts"),
    )
    merged = v.unionByName(p)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "view_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        merged
        .withColumn(
            "m_id", F.last("view_event_id", ignorenulls=True).over(w)
        )
        .withColumn("m_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
    )
    lag_us = F.unix_micros("ts") - F.unix_micros("m_ts")
    fresh = lag_us <= ASOF_TOLERANCE_MIN * 60 * 1_000_000
    return carried.select(
        "event_id",
        "user_id",
        F.when(fresh, F.col("m_id")).alias("asof_view_id"),
        F.when(fresh, F.floor(lag_us / 1_000_000).cast("long")).alias(
            "staleness_s"
        ),
    )


FUZZY_LEV_MAX = 3  # max edit distance for a candidate duplicate pair


@query(
    "q_join_fuzzy_block",
    oracle=f"""
        WITH names AS (
            SELECT DISTINCT p_name,
                   string_split(p_name, ' ')[-1] AS block
            FROM part
        ),
        pairs AS (
            SELECT a.block,
                   levenshtein(a.p_name, b.p_name) AS dist
            FROM names a JOIN names b
              ON a.block = b.block AND a.p_name < b.p_name
            WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_LEV_MAX}
        )
        SELECT block,
               CAST((SELECT count(*) FROM names n
                     WHERE n.block = pairs.block) AS BIGINT) AS n_names,
               CAST(count(*) AS BIGINT)                      AS n_close_pairs,
               CAST(sum(dist) AS BIGINT)                     AS dist_sum
        FROM pairs
        GROUP BY block
    """,
    description=f"Blocked fuzzy self-match: edit-distance <= {FUZZY_LEV_MAX} name pairs within noun blocks — the entity-resolution candidate-pair shape",
    tags=("join", "fuzzy", "text"),
)
def q_join_fuzzy_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution candidate generation, the fuzzy-matching shape
    every catalog-dedup pipeline runs: distinct names are BLOCKED by a
    cheap key (the head noun — last token of the two-word part name),
    pairs form only WITHIN a block, and the expensive edit-distance
    predicate prunes the pairs. Blocking is what makes fuzzy matching
    scale: the join is equi on the block key (shuffle-partitionable,
    never a cartesian over the corpus), and the O(|block|²) quadratic
    cost is bounded per block — the documented contract being that
    block sizes stay capped (a production pipeline salts or splits hot
    blocks, exactly like q_join_skew_salted).

    Dedup FIRST, pair SECOND: the pair join runs over DISTINCT names,
    not rows, so a million rows sharing 64 names cost the same 64-name
    block structure. levenshtein() evaluates JVM-side on both engines
    (no UDF). Reported per block: name count, close-pair count, and
    the summed distances (all integers — hash-exact)."""
    names = (
        load(spark, sf_dir, "part")
        .select("p_name")
        .distinct()
        .select(
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("block"),
        )
    )
    a = names.select(F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("p_name").alias("name_b"), F.col("block").alias("block_b"))
    pairs = (
        a.join(b, (F.col("block") == F.col("block_b")) & (F.col("name_a") < F.col("name_b")))
        .select("block", F.levenshtein("name_a", "name_b").alias("dist"))
        .filter(F.col("dist") <= FUZZY_LEV_MAX)
    )
    block_sizes = names.groupBy("block").agg(F.count(F.lit(1)).alias("n_names"))
    return (
        pairs.groupBy("block")
        .agg(
            F.count(F.lit(1)).alias("n_close_pairs"),
            F.sum("dist").alias("dist_sum"),
        )
        .join(F.broadcast(block_sizes), "block")
        .select("block", "n_names", "n_close_pairs", "dist_sum")
    )


# Synthetic deterministic point cloud for the spatial join: integer
# coordinates from md5 of the customer key (the shard_assign idiom) —
# engine-identical, no RNG, no libm, and genuinely dispersed. (A
# modular-multiplication lattice was tried first: its regular spacing
# produced ZERO close pairs at sf0.001 — structured coordinates are
# not a point cloud.)
SPATIAL_EXTENT = 4000  # coordinate range [0, EXTENT)
SPATIAL_RADIUS = 100  # "close" threshold; also the grid cell size
SPATIAL_TOP_K = 50


@query(
    "q_join_spatial_grid",
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey AS id,
                   ('0x' || substring(md5('x:' || CAST(c_custkey AS VARCHAR)), 1, 6))::INT
                       % {SPATIAL_EXTENT} AS x,
                   ('0x' || substring(md5('y:' || CAST(c_custkey AS VARCHAR)), 1, 6))::INT
                       % {SPATIAL_EXTENT} AS y
            FROM customer
        ),
        cells AS (
            SELECT id, x, y,
                   x // {SPATIAL_RADIUS} AS cx, y // {SPATIAL_RADIUS} AS cy
            FROM pts
        ),
        offsets AS (
            SELECT dx, dy
            FROM (SELECT unnest([-1, 0, 1]) AS dx),
                 (SELECT unnest([-1, 0, 1]) AS dy)
        ),
        pairs AS (
            SELECT a.id AS id_a, b.id AS id_b,
                   (a.x - b.x) * (a.x - b.x)
                   + (a.y - b.y) * (a.y - b.y) AS d2
            FROM cells a
            JOIN offsets o ON TRUE
            JOIN cells b
              ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
             AND a.id < b.id
        )
        SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
               CAST(d2 AS BIGINT) AS d2
        FROM pairs
        WHERE d2 < {SPATIAL_RADIUS * SPATIAL_RADIUS}
        ORDER BY d2, id_a, id_b
        LIMIT {SPATIAL_TOP_K}
    """,
    description=f"Grid-blocked spatial self-join: integer point cloud bucketed into radius-sized cells, 3x3 neighbor-cell equi-join (never all-pairs), closest-{SPATIAL_TOP_K} pairs by exact integer squared distance",
    tags=("join", "spatial", "blocking"),
)
def q_join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity self-join, the geospatial blocking pattern: bucket
    points into grid cells the size of the search radius, probe each
    point against its 3x3 neighbor cells via EQUI-join on the cell key
    (a pair within the radius cannot span more than one cell step, so
    the blocking is lossless), and keep pairs under the exact integer
    squared-distance threshold. Each qualifying pair matches exactly
    ONE offset (the cell delta), so no dedup pass is needed. Distance
    stays squared-integer — no sqrt, no floats, hash-exact.

    At 100 TB this is how point-proximity joins ship: the cell id is
    the shuffle key (both sides hash-partition on it), per-cell
    population bounds the quadratic term, and the 9-offset explode
    costs a constant fan-out of the smaller stream. Top-k cut is
    orderBy+limit = TakeOrdered on the (filtered) pair stream.

    Coordinates here are a deterministic md5 spray of the customer
    key (no RNG, engine-identical); a real deployment reads real
    lat/lon scaled to integer micro-degrees."""

    def coord(prefix: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(":", F.lit(prefix), F.col("c_custkey").cast("string"))
                    ),
                    1,
                    6,
                ),
                16,
                10,
            ).cast("long")
            % SPATIAL_EXTENT
        )

    pts = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        coord("x").alias("x"),
        coord("y").alias("y"),
    )
    cells = pts.select(
        "id",
        "x",
        "y",
        F.expr(f"x div {SPATIAL_RADIUS}").alias("cx"),
        F.expr(f"y div {SPATIAL_RADIUS}").alias("cy"),
    )
    probes = cells.select(
        F.col("id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"),
                        (F.col("cy") + dy).alias("cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("id_a", "xa", "ya", F.col("cell.cx").alias("cx"), F.col("cell.cy").alias("cy"))
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    pairs = (
        probes.join(cells, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id"))
        .select(
            "id_a",
            F.col("id").alias("id_b"),
            d2.alias("d2"),
        )
        .filter(F.col("d2") < SPATIAL_RADIUS * SPATIAL_RADIUS)
    )
    return pairs.orderBy("d2", "id_a", "id_b").limit(SPATIAL_TOP_K)


@query(
    "q_join_lateral_df",
    oracle="""
        SELECT n.n_name, t.c_name, t.top_acctbal_cents
        FROM nation n, LATERAL (
            SELECT c_name,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS top_acctbal_cents
            FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 1
        ) t
    """,
    description="DataFrame.lateralJoin (Spark 4.0 EP1): per-nation top-1 customer via an ORDER BY + LIMIT lateral subquery referencing the outer row, vs DuckDB's SQL LATERAL",
    tags=("join", "lateral"),
)
def q_join_lateral_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame-API twin of q_sql_lateral_join (golden.py):
    ``DataFrame.lateralJoin`` landed in Spark 4.0 as the programmatic
    form of SQL LATERAL — the inner frame references the outer row via
    ``Column.outer()`` and runs "per outer row" semantically. Pinned
    here as per-nation top-1 customer by (acctbal DESC, custkey): an
    ORDER BY + LIMIT lateral, the shape that is awkward as a window
    when only the top row is wanted. Nations with no customers drop
    (inner lateral) on both engines; balances are reported in exact
    integer cents.

    Scale shape: Catalyst DECORRELATES the lateral — the executed plan
    is a rank-window (or aggregate) over one hash join of customer
    against the 25-row broadcast nation, never a per-row re-execution;
    that optimizer rewrite is exactly what this key pins vs the naive
    loop a lateral implies."""
    nation = load(spark, sf_dir, "nation")
    customer = load(spark, sf_dir, "customer")
    top1 = (
        customer.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .limit(1)
        .select(
            "c_name",
            F.floor(F.col("c_acctbal") * 100 + 0.5)
            .cast("bigint")
            .alias("top_acctbal_cents"),
        )
    )
    return nation.lateralJoin(top1, how="inner").select(
        "n_name", "c_name", "top_acctbal_cents"
    )
