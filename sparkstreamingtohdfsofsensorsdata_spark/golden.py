"""Golden multi-operator pipelines: TPC-H-shaped queries through the
SQL entry point (SURVEY.md §3 EP2, §5.4).

These run as `spark.sql(...)` over the registered fixture views — the
same Catalyst pipeline as the DataFrame queries, entered through the
parser — so they exercise (a) the SQL surface itself, and (b) the
optimizer end-to-end on realistic join-agg pipelines: join reordering
across 3-6 tables, broadcast selection for the dim tables, partial
aggregation below the shuffle, and TakeOrderedAndProject for the
LIMIT-k outputs. Adapted to the fixture's reduced column set
(no l_commitdate/l_receiptdate/o_shippriority/partsupp — SURVEY.md
§1.2), with deterministic tiebreaks added to every LIMIT.

Because both sides of the oracle comparison are SQL, the text is
near-identical; the differences (round placement, date literals) are
deliberately minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import query
from .tables import register_views


def _sql(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(text)


_Q3 = """
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < DATE '1998-03-15'
      AND l_shipdate  > DATE '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
"""


@query(
    "q_tpch_q3",
    oracle=_Q3,
    description="TPC-H Q3 (shipping priority, adapted): 3-way join + agg + top-10",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q3)


_Q5 = """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    JOIN supplier  ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation    ON s_nationkey = n_nationkey
    JOIN region    ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1997-01-01'
    GROUP BY n_name
"""


@query(
    "q_tpch_q5",
    oracle=_Q5,
    description="TPC-H Q5 (local supplier volume, adapted): 6-way join, dims broadcast",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q5)


_Q10 = """
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal,
           n_name
    FROM customer
    JOIN orders    ON c_custkey = o_custkey
    JOIN lineitem  ON l_orderkey = o_orderkey
    JOIN nation    ON c_nationkey = n_nationkey
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_orderdate <  DATE '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
"""


@query(
    "q_tpch_q10",
    oracle=_Q10,
    description="TPC-H Q10 (returned items, adapted): 4-way join + agg + top-20",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _Q10)


_SUBQ = """
    SELECT c_mktsegment,
           count(*) AS n_above,
           round(avg(c_acctbal), 6) AS avg_above
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
    GROUP BY c_mktsegment
"""


@query(
    "q_subquery_scalar",
    oracle=_SUBQ,
    description="Uncorrelated scalar subquery in a predicate (Catalyst subquery rewrite)",
    tags=("golden", "sql", "subquery"),
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar subquery runs once as its own tiny job and is folded
    into the main scan's filter — no join, no per-row re-execution."""
    return _sql(spark, sf_dir, _SUBQ)


_CORR = """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE o_totalprice > 3 * (
        SELECT avg(o2.o_totalprice)
        FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
"""


@query(
    "q_subquery_correlated",
    oracle=_CORR,
    description="Correlated scalar subquery -> decorrelated to an aggregate + join",
    tags=("golden", "sql", "subquery"),
)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalyst decorrelates this into groupBy(o_custkey).avg + equi-join
    — the rewrite that turns a per-row subquery into one shuffle."""
    return _sql(spark, sf_dir, _CORR)


_Q6 = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*)                                    AS n_lines
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
      AND l_shipdate <  DATE '1996-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
"""


@query(
    "q_tpch_q6",
    oracle=_Q6,
    description="TPC-H Q6 (revenue forecast): pure scan-filter-agg, every predicate pushed to parquet",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """No join at all — the whole query is a pushdown test: date range,
    numeric BETWEEN and < must reach the parquet scan, and the agg is a
    single partial+final pair with no groupBy shuffle."""
    return _sql(spark, sf_dir, _Q6)


_Q7 = """
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 2) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
          AND l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
"""


@query(
    "q_tpch_q7",
    oracle=_Q7,
    description="TPC-H Q7 (volume shipping, adapted): nation self-join pair filter + per-year agg",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joins nation TWICE (supplier's and customer's) with a disjunctive
    pair predicate — the join-reorder + broadcast-both-dims case. The
    nation filter cannot be pushed below the join of both sides, so
    Catalyst must keep it as a post-join filter on the pair."""
    return _sql(spark, sf_dir, _Q7)


_Q14 = """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1995-09-01'
      AND l_shipdate <  DATE '1995-10-01'
"""


@query(
    "q_tpch_q14",
    oracle=_Q14,
    description="TPC-H Q14 (promo effect): conditional agg ratio over a part join",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregation ratio: one join (part side broadcast at
    this SF), CASE folded into the partial agg — only two running sums
    cross the exchange, never the matched rows."""
    return _sql(spark, sf_dir, _Q14)


_Q18 = """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 2) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(l_quantity) > 210
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
"""


@query(
    "q_tpch_q18",
    oracle=_Q18,
    description="TPC-H Q18 (large-volume customers, adapted): IN over a grouped HAVING subquery + top-100",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IN-subquery rewrites to a left-semi join against the
    pre-aggregated order list; the semi side aggregates BEFORE joining,
    so the fact table is filtered by ~0.5% of keys instead of being
    joined full-width — the shape that survives a 100x scale-up."""
    return _sql(spark, sf_dir, _Q18)


_Q19 = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*)                                          AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 21)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#5'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 40)
"""


@query(
    "q_tpch_q19",
    oracle=_Q19,
    description="TPC-H Q19 (discounted revenue, adapted): disjunctive mixed-table predicate over a join",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction mixing columns from BOTH join sides: Catalyst must
    still derive the per-side implied filters (brand IN (...) on part,
    quantity <= 40 on lineitem) and push them below the join — the
    classic predicate-inference test."""
    return _sql(spark, sf_dir, _Q19)


_Q13 = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    )
    GROUP BY c_count
"""


@query(
    "q_tpch_q13",
    oracle=_Q13,
    description="TPC-H Q13 (customer distribution, adapted): outer join with join-condition filter + double aggregation",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution. The load-bearing semantics:
    the priority filter lives in the JOIN condition, not WHERE — a
    WHERE would silently turn the outer join inner and drop the
    zero-order customers that are the query's whole point. Two
    aggregations: per-customer count (user_id-cardinality shuffle),
    then the tiny histogram over counts."""
    return _sql(spark, sf_dir, _Q13)


_Q16 = """
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 4, 7, 10, 15, 23, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 40
"""


@query(
    "q_tpch_q16",
    oracle=_Q16,
    description="TPC-H Q16 (supplier count by part attrs, adapted): NOT-IN anti join + count distinct",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-part variety per attribute bucket, with lineitem
    standing in for the absent partsupp bridge (SURVEY.md §1.2) and a
    negative-balance supplier exclusion for Q16's complaint filter.
    NOT IN over a not-null key becomes a null-aware anti join on the
    broadcast-sized supplier list; count(DISTINCT) expands to the
    two-phase distinct aggregate."""
    return _sql(spark, sf_dir, _Q16)


_Q22 = """
    WITH ab AS (
        SELECT floor(avg(c_acctbal)) AS t FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer, ab
    WHERE c_acctbal > t
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_mktsegment
"""


@query(
    "q_tpch_q22",
    oracle=_Q22,
    description="TPC-H Q22 (global sales opportunity, adapted): scalar-subquery threshold + NOT EXISTS anti join",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no urgent orders (every
    fixture customer has SOME order, so Q22's 'never ordered' becomes
    'no urgent order' — same anti-join plan). The average threshold is
    floor()ed to a whole dollar: c_acctbal carries 2 decimals, so the
    comparison can't land on the float boundary where Spark's and
    DuckDB's last-ulp avg() difference could flip a row."""
    return _sql(spark, sf_dir, _Q22)


_NOT_IN = """
    WITH probe AS (
        SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        UNION ALL
        SELECT CAST(NULL AS BIGINT)
    ),
    via_not_in AS (
        SELECT count(*) AS n FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM probe)
    ),
    via_not_exists AS (
        SELECT count(*) AS n FROM customer c
        WHERE NOT EXISTS (
            SELECT 1 FROM probe p WHERE p.o_custkey = c.c_custkey
        )
    ),
    via_in AS (
        SELECT count(*) AS n FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM probe)
    )
    SELECT 'not_in'     AS method, n FROM via_not_in
    UNION ALL
    SELECT 'not_exists' AS method, n FROM via_not_exists
    UNION ALL
    SELECT 'in'         AS method, n FROM via_in
"""


@query(
    "q_subquery_not_in",
    oracle=_NOT_IN,
    description="NOT IN vs NOT EXISTS under a NULL-poisoned subquery (null-aware anti join)",
    tags=("golden", "sql", "subquery"),
)
def q_subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic trap made executable: the probe list carries
    one NULL, so ``NOT IN`` is UNKNOWN for every outer row (count 0)
    while ``NOT EXISTS`` keeps its usual anti-join semantics — the two
    counts differ on the same data. Catalyst plans the NOT IN branch as
    a null-aware anti join (NAAJ); at scale the probe side must stay
    broadcast-small because NAAJ cannot shuffle-partition a NULL-aware
    predicate, which is exactly why production pipelines prefer
    NOT EXISTS — this key pins both behaviors side by side."""
    return _sql(spark, sf_dir, _NOT_IN)


_Q4 = """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= DATE '1996-01-01'
      AND o_orderdate <  DATE '1996-07-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o.o_orderkey
            AND l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
"""


@query(
    "q_tpch_q4",
    oracle=_Q4,
    description="TPC-H Q4 (order priority checking, adapted): correlated EXISTS -> semi join + agg",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: the fixture carries no l_commitdate/l_receiptdate, so
    'late' is l_shipdate > o_orderdate + 90 days — the EXISTS still
    correlates on BOTH an equality (orderkey) and an inequality over an
    outer column, which Catalyst decorrelates into a left-semi join
    with the inequality as a post-join condition. One shuffle pair on
    orderkey, then a tiny priority aggregation."""
    return _sql(spark, sf_dir, _Q4)


_Q8 = """
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_7' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM lineitem
        JOIN part      ON p_partkey = l_partkey
        JOIN supplier  ON s_suppkey = l_suppkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region    ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate >= DATE '1995-01-01'
          AND o_orderdate <  DATE '1997-01-01'
    ) all_volume
    GROUP BY o_year
    ORDER BY o_year
"""


@query(
    "q_tpch_q8",
    oracle=_Q8,
    description="TPC-H Q8 (national market share, adapted): 8-way star join + conditional ratio per year",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The widest golden join (8 tables, nation twice under different
    roles). Every dimension is broadcast at any SF — only lineitem x
    orders is a real shuffle pair — and the two CASE sums are the only
    values crossing the final exchange. The supplier-nation share of
    an AMERICA-region customer market, per order year."""
    return _sql(spark, sf_dir, _Q8)


_Q12 = """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >  o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= DATE '1996-01-01'
      AND l_shipdate <  DATE '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
"""


@query(
    "q_tpch_q12",
    oracle=_Q12,
    description="TPC-H Q12 (shipping delay vs priority, adapted): join + dual conditional counts",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: no l_shipmode/l_receiptdate in the fixture — the class
    column is l_linestatus and 'late' is ship > order + 60 days. The
    join condition's inequality references both sides, so it stays a
    residual on the orderkey equi join; the two CASE counts partial-
    aggregate map-side (integer sums cast to BIGINT to match DuckDB's
    HUGEINT sum)."""
    return _sql(spark, sf_dir, _Q12)


_Q15 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(floor(sum(l_extendedprice * (1 - l_discount))) AS BIGINT)
                   AS total_revenue_flr
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue_flr
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue_flr = (SELECT max(total_revenue_flr) FROM revenue)
    ORDER BY s_suppkey
"""


@query(
    "q_tpch_q15",
    oracle=_Q15,
    description="TPC-H Q15 (top supplier, adapted): CTE reuse + scalar max subquery",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The revenue CTE is referenced twice (argmax pattern); Catalyst
    evaluates the scalar max as its own tiny job and folds it into the
    main filter. Revenues are floor()ed to BIGINT BEFORE the equality
    compare — the Q22 guard: a float sum's last ulp must never decide
    WHICH rows the argmax keeps."""
    return _sql(spark, sf_dir, _Q15)


_Q17 = """
    WITH pq AS (
        SELECT l_partkey,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum,
               count(*) AS cnt
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem li
    JOIN part ON p_partkey = li.l_partkey
    JOIN pq   ON pq.l_partkey = li.l_partkey
    WHERE p_brand = 'Brand#1'
      AND p_size < 15
      AND 5 * CAST(li.l_quantity AS BIGINT) * cnt < qsum
"""


@query(
    "q_tpch_q17",
    oracle=_Q17,
    description="TPC-H Q17 (small-quantity-order revenue, adapted): per-part avg threshold as exact integer arithmetic",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original's correlated `l_quantity < 0.2 * avg(l_quantity)`
    is rewritten as `5 * qty * cnt < qsum` over a per-part aggregate
    join: the fixture's quantities are integral, so the threshold
    becomes EXACT integer arithmetic and the row membership cannot
    flip on a float-avg ulp between engines (the class of boundary
    q_tpch_q22 floors away). Decorrelated shape = groupBy(partkey) +
    one equi join, the same plan Catalyst builds for the subquery
    form, but with the float hazard engineered out."""
    return _sql(spark, sf_dir, _Q17)


_Q21 = """
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
        GROUP BY l_orderkey, l_suppkey
    ),
    ordstats AS (
        SELECT l.l_orderkey,
               count(DISTINCT l.l_suppkey)  AS n_supps,
               count(DISTINCT lt.l_suppkey) AS n_late_supps
        FROM lineitem l
        LEFT JOIN late lt
               ON lt.l_orderkey = l.l_orderkey AND lt.l_suppkey = l.l_suppkey
        GROUP BY l.l_orderkey
    )
    SELECT s_name, count(*) AS numwait
    FROM late
    JOIN ordstats ON ordstats.l_orderkey = late.l_orderkey
    JOIN supplier ON s_suppkey = late.l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_supps > 1
      AND n_late_supps = 1
      AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
"""


@query(
    "q_tpch_q21",
    oracle=_Q21,
    description="TPC-H Q21 (suppliers who kept orders waiting, adapted): sole-late-supplier via relational set algebra",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original's EXISTS / NOT EXISTS pair (another supplier on the
    order; no OTHER supplier late) is expressed as per-order set
    counts: a supplier 'kept the order waiting' iff the order has >1
    distinct supplier and exactly 1 distinct LATE supplier (this one).
    Same semantics, but the doubly-correlated non-equi NOT EXISTS —
    whose decorrelation re-joins lineitem twice — becomes one grouped
    pass over lineitem plus equi joins only. Ties at the LIMIT edge
    are impossible: (numwait DESC, s_name) is a total order."""
    return _sql(spark, sf_dir, _Q21)


_Q2 = """
    WITH cost AS (
        SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supplycost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT c.l_partkey, c.supplycost, s_acctbal, s_name, n_name
        FROM cost c
        JOIN supplier ON s_suppkey = c.l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
           p_partkey, p_name, round(supplycost, 2) AS supplycost
    FROM part
    JOIN eu ON p_partkey = eu.l_partkey
    WHERE p_size <= 15
      AND p_type = 'LARGE'
      AND supplycost = (
          SELECT min(e2.supplycost) FROM eu e2
          WHERE e2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
"""


@query(
    "q_tpch_q2",
    oracle=_Q2,
    description="TPC-H Q2 (minimum cost supplier, adapted): correlated argmin over a region-filtered bridge",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: the fixture has no partsupp, so the part-supplier bridge
    is lineitem grouped to (partkey, suppkey) with min(l_extendedprice)
    standing in for ps_supplycost. The correlated min subquery over the
    SAME region-filtered CTE is the classic argmin: Catalyst
    decorrelates it into a per-part aggregate + equi join, so the
    bridge is built once and shuffled once on partkey. Float-safe by
    construction: min() of identical doubles is order-independent (no
    accumulation), so the equality compare cannot flip on an ulp the
    way a sum-based argmax could (the hazard q_tpch_q15 floors away).
    (s_acctbal DESC, n_name, s_name, p_partkey) totally orders the
    LIMIT edge — a (supplier, part) pair appears at most once."""
    return _sql(spark, sf_dir, _Q2)


_Q9 = """
    SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
"""


@query(
    "q_tpch_q9",
    oracle=_Q9,
    description="TPC-H Q9 (product type profit, adapted): 5-way star join + per-nation-year profit",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: ps_supplycost becomes a 60%-of-retail cost model from
    the part dimension (0.6 * p_retailprice * l_quantity), keeping
    Q9's shape — a part-name substring filter that CANNOT be pushed as
    a parquet range predicate (LIKE '%red%' needs the row), a 5-table
    star where part/supplier/nation broadcast, and lineitem x orders as
    the one real shuffle pair. Output is nation x year — tiny — so the
    final agg exchanges only ~25 x 7 groups of partial sums."""
    return _sql(spark, sf_dir, _Q9)


_Q11 = """
    WITH value AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS value_cents
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, value_cents
    FROM value
    WHERE value_cents > (
        SELECT CAST(floor(2.0 * sum(value_cents) / count(*)) AS BIGINT)
        FROM value
    )
    ORDER BY value_cents DESC, ps_partkey
"""


@query(
    "q_tpch_q11",
    oracle=_Q11,
    description="TPC-H Q11 (important stock, adapted): CTE reuse + scalar threshold in exact cents",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: 'stock value' is the lineitem revenue a nation's
    suppliers carry per part, and the original's `> 0.0001/SF of
    total` threshold — which bakes the scale factor into the query
    text — becomes the scale-free `> 2x the mean part value`. All
    arithmetic is exact: prices are converted to integer cents BEFORE
    summing, so both engines sum the same BIGINTs
    (order-independent), and the threshold is one floor()ed division.
    The value CTE is referenced twice; the scalar branch reduces to
    one row and folds into the main filter — no self-join of the
    aggregate."""
    return _sql(spark, sf_dir, _Q11)


_Q20 = """
    SELECT s_name, n_name, round(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        WHERE l_partkey IN (
            SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
        )
          AND l_shipdate >= DATE '1996-01-01'
          AND l_shipdate <  DATE '1997-01-01'
        GROUP BY l_suppkey
        HAVING CAST(sum(l_quantity) AS BIGINT) > 100
    )
    ORDER BY s_name
"""


@query(
    "q_tpch_q20",
    oracle=_Q20,
    description="TPC-H Q20 (potential part promotion, adapted): nested IN -> stacked semi joins + grouped HAVING",
    tags=("golden", "sql", "tpch"),
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adapted: without partsupp availqty, 'has excess stock to
    promote' becomes 'shipped >100 units of small-named parts in
    1996'. The nested IN chain is the point: part-name filter -> semi
    join into lineitem (the part list broadcasts), grouped HAVING on
    the supplier key, then a second semi join into the supplier dim.
    The fact table is scanned once with the date range pushed to
    parquet; quantities are integral, so the HAVING compares exact
    BIGINTs. Output is supplier-bounded (dim-sized), never
    fact-sized."""
    return _sql(spark, sf_dir, _Q20)


@query(
    "q_sql_view_chain",
    oracle="""
        WITH brand_parts AS (
            SELECT p_partkey, p_brand, p_retailprice
            FROM part WHERE p_size >= 20
        ),
        brand_sales AS (
            SELECT bp.p_brand,
                   CAST(count(*) AS BIGINT) AS n_lines,
                   CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem l JOIN brand_parts bp ON l.l_partkey = bp.p_partkey
            GROUP BY bp.p_brand
        )
        SELECT s.p_brand,
               s.n_lines,
               s.revenue_cents,
               CAST(c.n_parts AS BIGINT) AS n_parts,
               CAST(s.revenue_cents // c.n_parts AS BIGINT)
                   AS cents_per_part
        FROM brand_sales s
        JOIN (
            SELECT p_brand, count(*) AS n_parts FROM brand_parts GROUP BY 1
        ) c ON c.p_brand = s.p_brand
    """,
    description="Layered SQL view chain: temp views stacked three deep and queried through spark.sql — pins that view indirection costs NOTHING (Catalyst inlines views; the plan equals the hand-fused query)",
    tags=("sql", "view", "golden"),
)
def q_sql_view_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BI-tool shape: analysts stack temp views (filtered dim ->
    joined rollup -> per-unit ratios) and query the TOP one. The point
    at scale is that Spark views are ANALYSIS-TIME MACROS — Catalyst
    inlines the chain and optimizes the fused plan, so the part filter
    still pushes into the parquet scan three layers down and the view
    boundary costs zero runtime (the same chain as the oracle's
    in-lined CTEs, which is the proof). View names are re-registered
    per call (createOrReplaceTempView), so repeated runs in one
    session stay self-consistent."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW vc_brand_parts AS
        SELECT p_partkey, p_brand, p_retailprice
        FROM part WHERE p_size >= 20
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW vc_brand_sales AS
        SELECT bp.p_brand,
               count(*) AS n_lines,
               sum(cast(floor(l.l_extendedprice * 100 + 0.5d) AS bigint))
                   AS revenue_cents
        FROM lineitem l JOIN vc_brand_parts bp ON l.l_partkey = bp.p_partkey
        GROUP BY bp.p_brand
        """
    )
    return spark.sql(
        """
        SELECT s.p_brand,
               s.n_lines,
               s.revenue_cents,
               c.n_parts,
               (s.revenue_cents div c.n_parts) AS cents_per_part
        FROM vc_brand_sales s
        JOIN (
            SELECT p_brand, count(*) AS n_parts
            FROM vc_brand_parts GROUP BY p_brand
        ) c ON c.p_brand = s.p_brand
        """
    )


@query(
    "q_tpch_q1",
    oracle="""
        WITH l AS (
            SELECT l_returnflag, l_linestatus,
                   CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)      AS qty_c,
                   CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
                   CAST(floor(l_discount * 10000 + 0.5) AS BIGINT)    AS d_bps,
                   CAST(floor(l_tax * 10000 + 0.5) AS BIGINT)         AS t_bps
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
        ),
        p AS (
            SELECT l_returnflag, l_linestatus, qty_c, cents, d_bps, t_bps,
                   (cents * (10000 - d_bps)) // 10000 AS disc_cents
            FROM l
        )
        SELECT l_returnflag, l_linestatus,
               CAST(sum(qty_c) AS BIGINT)      AS sum_qty_centi,
               CAST(sum(cents) AS BIGINT)      AS sum_base_cents,
               CAST(sum(disc_cents) AS BIGINT) AS sum_disc_cents,
               CAST(sum((disc_cents * (10000 + t_bps)) // 10000) AS BIGINT)
                   AS sum_charge_cents,
               CAST(sum(qty_c) // count(*) AS BIGINT) AS avg_qty_centi,
               CAST(sum(cents) // count(*) AS BIGINT) AS avg_price_cents,
               CAST(sum(d_bps) // count(*) AS BIGINT) AS avg_disc_bps,
               CAST(count(*) AS BIGINT)               AS count_order
        FROM p GROUP BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 (pricing summary, adapted to the repo's integer-exact money contract): full-scan partial+final agg over (returnflag, linestatus), all sums/avgs as exact BIGINT cents/centi/bps units",
    tags=("golden", "sql", "tpch", "aggregate"),
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completes the 22-query TPC-H suite (q2-q22 landed r5-r8). Q1 is
    the canonical scan-dominated aggregation: no join, one groupBy
    whose 4-6 groups make the partial agg absorb virtually all rows
    map-side — at 100 TB the shuffle moves ~groups x partitions rows
    regardless of input size, and the scan reads exactly the 7 needed
    columns (ReadSchema-gated family).

    Money arithmetic follows the repo's exact-integer contract rather
    than the spec's DECIMAL: per-row floor-rendered cents/bps, the
    (1-disc) and (1+tax) factors applied as integer basis-point
    products with ONE floor division each (deterministic on both
    engines; products bounded by 1e11 << 2^63), sums in BIGINT, avgs
    as BIGINT floor-division ratios — so the whole result is
    hash-exact with zero float accumulation anywhere."""
    from pyspark.sql import functions as F

    from .tables import load

    l = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("cast(floor(l_quantity * 100 + 0.5d) as bigint)").alias(
                "qty_c"
            ),
            F.expr(
                "cast(floor(l_extendedprice * 100 + 0.5d) as bigint)"
            ).alias("cents"),
            F.expr("cast(floor(l_discount * 10000 + 0.5d) as bigint)").alias(
                "d_bps"
            ),
            F.expr("cast(floor(l_tax * 10000 + 0.5d) as bigint)").alias(
                "t_bps"
            ),
        )
        .withColumn(
            "disc_cents", F.expr("(cents * (10000 - d_bps)) div 10000")
        )
    )
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty_c").alias("sum_qty_centi"),
        F.sum("cents").alias("sum_base_cents"),
        F.sum("disc_cents").alias("sum_disc_cents"),
        F.sum(F.expr("(disc_cents * (10000 + t_bps)) div 10000")).alias(
            "sum_charge_cents"
        ),
        F.expr("sum(qty_c) div count(*)").alias("avg_qty_centi"),
        F.expr("sum(cents) div count(*)").alias("avg_price_cents"),
        F.expr("sum(d_bps) div count(*)").alias("avg_disc_bps"),
        F.count(F.lit(1)).alias("count_order"),
    )


_LATERAL = """
    SELECT n.n_name,
           t.c_custkey        AS top_custkey,
           t.bal_cents        AS top_bal_cents,
           a.n_cust,
           a.total_bal_cents
    FROM nation n,
    LATERAL (
        SELECT c_custkey,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY bal_cents DESC, c_custkey
        LIMIT 1
    ) t,
    LATERAL (
        SELECT CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT)          AS total_bal_cents
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
    ) a
"""


@query(
    "q_sql_lateral_join",
    oracle=_LATERAL,
    description="LATERAL correlated subqueries: per-nation top-1 customer (ORDER BY + LIMIT inside the lateral) and a lateral aggregate, same SQL text on both engines",
    tags=("golden", "sql", "lateral"),
)
def q_sql_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL subqueries — the SQL-standard form of "for each outer
    row, run this parameterized subquery": one lateral with ORDER BY +
    LIMIT (top-1 per group without a window) and one lateral aggregate,
    in the SAME SQL text both engines parse. Catalyst decorrelates
    both: the LIMIT lateral becomes a rank-window over a hash join and
    the aggregate lateral a grouped join — i.e., the engine, not the
    user, picks the join-vs-window physical form; nations that lack
    customers drop on both sides (inner lateral).

    Scale shape: after decorrelation the plan is customer shuffled once
    by nationkey against a broadcast 25-row nation — no per-row
    re-execution, which is the point of pinning LATERAL through the
    optimizer rather than looping driver-side."""
    return _sql(spark, sf_dir, _LATERAL)


_RECURSIVE = """
    WITH RECURSIVE months(m) AS (
        SELECT DATE '1995-01-01'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < DATE '2001-08-01'
    )
    SELECT y.yr,
           CAST(count(DISTINCT y.m) AS BIGINT) AS n_months,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o.o_orderkey IS NOT NULL
                    THEN CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                    ELSE 0 END) AS BIGINT)     AS revenue_cents
    FROM (SELECT m, CAST(EXTRACT(YEAR FROM m) AS INT) AS yr
          FROM months) y
    LEFT JOIN orders o
      ON CAST(o.o_orderdate AS DATE) >= y.m
     AND CAST(o.o_orderdate AS DATE) < y.m + INTERVAL 1 MONTH
    GROUP BY y.yr
"""


@query(
    "q_sql_recursive_cte",
    oracle=_RECURSIVE,
    description="WITH RECURSIVE month-spine generation (80 iterations) joined back to orders: recursion parity pinned on identical SQL text (Spark 4 recursive CTE support)",
    tags=("golden", "sql", "recursive"),
)
def q_sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE — the SQL surface every calendar-spine, org-chart
    and bill-of-materials query needs, newly supported by Spark 4's
    parser/optimizer (UnionLoop execution). The recursion builds an
    80-month date spine (fixture orders span 1995-01..2001-08), then a
    range LEFT JOIN rolls order counts and exact revenue cents into
    spine years — months with no orders still count toward n_months,
    pinning the recursion's row set, not just aggregates that would
    hide a missing iteration.

    Scale shape: the recursive part is 80 driver-side rows (recursion
    depth bounds the spine, never the data); the only data-sized work
    is the orders range join against a broadcast spine and one yearly
    rollup. Recursion over DATA (transitive closure) stays in the
    iterative DataFrame kernels (q_graph_wcc's pointer doubling) —
    a recursive CTE would re-shuffle the whole edge set per iteration
    with no checkpoint truncation."""
    return _sql(spark, sf_dir, _RECURSIVE)


_PIVOT_SPARK = """
    SELECT * FROM (
        SELECT year(o_orderdate) AS yr, o_orderstatus AS st,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        FROM orders
    ) PIVOT (
        count(*) AS n, sum(cents) AS cents
        FOR st IN ('F' AS f, 'O' AS o, 'P' AS p)
    )
    ORDER BY yr
"""

_PIVOT_ORACLE = """
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS yr,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END)
                AS BIGINT)                                   AS f_n,
           CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                END) AS BIGINT)                              AS f_cents,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END)
                AS BIGINT)                                   AS o_n,
           CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                END) AS BIGINT)                              AS o_cents,
           CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END)
                AS BIGINT)                                   AS p_n,
           CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                END) AS BIGINT)                              AS p_cents
    FROM orders
    GROUP BY 1
    ORDER BY yr
"""


@query(
    "q_sql_pivot",
    oracle=_PIVOT_ORACLE,
    description="SQL PIVOT clause (multi-aggregate, aliased pivot values): order count + revenue cents per year x status matrix; absent combinations stay NULL on both engines",
    tags=("golden", "sql", "pivot"),
)
def q_sql_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-surface PIVOT clause (r13) — the spreadsheet-shaped
    rollup analysts write constantly; q_agg_pivot covers the DataFrame
    ``groupBy().pivot()`` API, this key pins the PARSER path with
    multiple aggregates and aliased pivot values (column naming
    contract: ``{value_alias}_{agg_alias}``). The oracle is the
    de-sugared CASE-WHEN form every engine ultimately compiles to —
    sum(CASE WHEN) deliberately, because a year x status combination
    with no orders is NULL under PIVOT (not 0), and sum-over-empty
    mirrors that where count would not. Revenue folds as
    floor(x*100+0.5) BIGINT cents (q_agg_group contract).

    Scale shape: one map-side-combined aggregation on the (year,
    status) key, then the pivot is a width-3 projection — no second
    shuffle; Catalyst plans PIVOT as groupBy + PivotFirst, the same
    plan the CASE-WHEN form gets."""
    return _sql(spark, sf_dir, _PIVOT_SPARK)


_AGG_FILTER = """
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_totalprice > 100000)
                AS BIGINT)          AS n_big,
           CAST(coalesce(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'F'), 0)
                AS BIGINT)          AS finished_cents,
           CAST(coalesce(min(o_orderkey)
                    FILTER (WHERE o_orderstatus = 'P'), -1)
                AS BIGINT)          AS first_pending_key
    FROM orders
    GROUP BY o_orderpriority
"""


@query(
    "q_sql_agg_filter",
    oracle=_AGG_FILTER,
    description="SQL FILTER clause on aggregates (count/sum/min with per-aggregate predicates), same SQL text both engines; empty-filter groups pinned via coalesce",
    tags=("golden", "sql", "aggregate"),
)
def q_sql_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-standard FILTER clause (r13) — per-aggregate predicates
    without the CASE-WHEN contortion, the form analysts write for
    conditional metrics ("orders, big orders, finished revenue — one
    GROUP BY"). The SAME SQL text runs on both engines (Spark has
    supported FILTER since 3.0; DuckDB natively), so the key pins the
    parser surface itself, plus the edge the clause hides: an
    aggregate whose filter matches NO rows in a group is NULL (not 0)
    — coalesced explicitly on both sides so the contract is visible.

    Scale shape: identical plan to the CASE-WHEN form — one map-side-
    combined aggregation on the 5-value priority key; the filters
    evaluate inside the partial aggregate, adding zero shuffles."""
    return _sql(spark, sf_dir, _AGG_FILTER)


_TABLESAMPLE = """
    SELECT
        (SELECT count(*) FROM orders TABLESAMPLE (100 PERCENT))
            = (SELECT count(*) FROM orders)              AS full_is_total,
        CAST((SELECT count(*) FROM orders TABLESAMPLE (0 PERCENT))
            AS BIGINT)                                   AS n_empty,
        CAST((SELECT count(*) FROM orders TABLESAMPLE (500 ROWS))
            AS BIGINT)                                   AS rows_clamped,
        (SELECT count(*) FROM orders
            TABLESAMPLE (50 PERCENT) REPEATABLE (42))
            BETWEEN CAST(0.40 * (SELECT count(*) FROM orders) AS BIGINT)
                AND CAST(0.60 * (SELECT count(*) FROM orders) AS BIGINT)
                                                         AS half_in_bounds
"""


@query(
    "q_sql_tablesample",
    oracle="""
        SELECT TRUE                                       AS full_is_total,
               CAST(0 AS BIGINT)                          AS n_empty,
               CAST(least(500, (SELECT count(*) FROM orders)) AS BIGINT)
                                                          AS rows_clamped,
               TRUE                                       AS half_in_bounds
    """,
    description="SQL TABLESAMPLE semantics pin: 100/0 PERCENT exact edges, n ROWS clamps to min(n, total), BERNOULLI 50 PERCENT REPEATABLE lands in concentration bounds",
    tags=("golden", "sql", "sampling"),
)
def q_sql_tablesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE — the SQL sampling surface (Spark's SampleExec /
    sample pushed into the scan). RNG streams are engine-specific, so
    the pin is on the DETERMINISTIC contract, not the draw: 100 PERCENT
    is every row, 0 PERCENT is none, (n ROWS) clamps exactly to
    min(n, total), and a 50 PERCENT Bernoulli sample under REPEATABLE
    (seeded, reproducible run to run) must land within ±10pp of half —
    at the smallest fixture that is >6 sigma, so the boolean is stable.
    The oracle states the contract as literals/exact expressions.

    Scale shape: TABLESAMPLE PERCENT is a per-row Bernoulli filter
    evaluated inside the scan stage — no shuffle, no skew, trivially
    parallel; (n ROWS) is a LIMIT (one final single-partition take of
    n rows, fine for n this small)."""
    return _sql(spark, sf_dir, _TABLESAMPLE)


_DISTRIBUTE_BY = """
    SELECT d.o_orderpriority, d.n_orders, d.total_cents, c.n_cluster
    FROM (
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT)   AS n_orders,
               CAST(sum(cents) AS BIGINT) AS total_cents
        FROM (
            SELECT o_orderpriority,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders
            DISTRIBUTE BY o_orderpriority SORT BY o_orderkey
        )
        GROUP BY o_orderpriority
    ) d
    JOIN (
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_cluster
        FROM (SELECT o_orderpriority FROM orders CLUSTER BY o_orderpriority)
        GROUP BY o_orderpriority
    ) c ON d.o_orderpriority = c.o_orderpriority
"""


@query(
    "q_sql_distribute_by",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)           AS total_cents,
               CAST(count(*) AS BIGINT) AS n_cluster
        FROM orders
        GROUP BY o_orderpriority
    """,
    description="DISTRIBUTE BY / SORT BY / CLUSTER BY semantics pin: repartition+sort clauses change layout, never content — aggregates over the redistributed subqueries equal the plain ones",
    tags=("golden", "sql", "layout"),
)
def q_sql_distribute_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTRIBUTE BY / SORT BY / CLUSTER BY — Spark's Hive-inherited
    layout clauses (CLUSTER BY = DISTRIBUTE BY + SORT BY on the same
    keys). They compile to a hash repartitioning (plus intra-partition
    sort) and MUST be content-neutral: this key aggregates over both
    redistributed subqueries and checks the result equals the plain
    aggregate the oracle computes with no layout clauses at all.

    Scale shape: this is the idiom for pre-shuffling ahead of a write
    (one file per partition key) or a skew-aware layout; the clause
    inserts exactly one Exchange — the aggregate then reuses that
    partitioning instead of adding its own, which is why the pattern
    costs nothing when the keys line up."""
    return _sql(spark, sf_dir, _DISTRIBUTE_BY)


_SQL_UDF_QUERY = """
    SELECT qty_band(l_quantity)       AS band,
           CAST(count(*) AS BIGINT)   AS n_items,
           CAST(sum(disc_cents(l_extendedprice, l_discount)) AS BIGINT)
                                      AS revenue_cents,
           CAST(sum(half_disc_cents(l_extendedprice, l_discount)) AS BIGINT)
                                      AS half_cents
    FROM lineitem
    GROUP BY qty_band(l_quantity)
"""


@query(
    "q_sql_scalar_udf",
    oracle="""
        WITH t AS (
            SELECT CASE WHEN l_quantity < 10 THEN 'low'
                        WHEN l_quantity < 35 THEN 'mid'
                        ELSE 'high' END AS band,
                   CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                       AS BIGINT) AS cents
            FROM lineitem
        )
        SELECT band,
               CAST(count(*) AS BIGINT)       AS n_items,
               CAST(sum(cents) AS BIGINT)     AS revenue_cents,
               CAST(sum(cents // 2) AS BIGINT) AS half_cents
        FROM t
        GROUP BY band
    """,
    description="SQL scalar UDFs (CREATE FUNCTION ... RETURN, Spark 4.0): expression UDF, CASE UDF, and a UDF calling another UDF, inlined by Catalyst into a plain aggregate",
    tags=("golden", "sql", "udf"),
)
def q_sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs — ``CREATE FUNCTION ... RETURNS ... RETURN
    <expr>`` landed in Spark 4.0 (SQL UDFs): named, typed, pure-SQL
    functions that Catalyst INLINES into the calling plan, so they
    cost nothing at runtime (unlike Python UDFs — this is the
    recommended way to share scalar logic). Three semantics pinned:
    an arithmetic expression UDF (disc_cents -> exact integer cents),
    a CASE UDF used in both the projection and the GROUP BY
    (qty_band), and UDF COMPOSITION (half_disc_cents calls disc_cents;
    DIV floor-division equals DuckDB's // on these non-negative
    cents). The oracle states the same logic inline.

    Scale shape: after inlining, the executed plan is one map-side-
    combined hash aggregate over the scan — WholeStageCodegen spans
    the UDF bodies; no function-call boundary survives optimization."""
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION disc_cents(p DOUBLE, d DOUBLE) "
        "RETURNS BIGINT RETURN CAST(floor(p * (1 - d) * 100 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION qty_band(q DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN q < 10 THEN 'low' "
        "WHEN q < 35 THEN 'mid' ELSE 'high' END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION half_disc_cents"
        "(p DOUBLE, d DOUBLE) RETURNS BIGINT "
        "RETURN disc_cents(p, d) DIV 2"
    )
    return spark.sql(_SQL_UDF_QUERY)


_OFFSET = """
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    FROM orders
    ORDER BY o_orderkey
    LIMIT 7 OFFSET 13
"""


@query(
    "q_sql_offset",
    oracle=_OFFSET,
    description="SQL LIMIT ... OFFSET pagination pin: deterministic ORDER BY page slice, same SQL text on both engines",
    tags=("golden", "sql", "pagination"),
)
def q_sql_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... OFFSET — the pagination clause (Spark 3.4+). Under a
    deterministic total order (unique o_orderkey) the page slice is
    exact and the SAME SQL text runs on both engines. Semantics
    pinned: OFFSET skips exactly 13 rows of the global order, LIMIT
    caps the page at 7, and the combination composes with ORDER BY
    (not with each other's parse order).

    Scale shape: Spark plans this as TakeOrdered(limit + offset) —
    per-partition top-(20) heaps merged on the driver, never a global
    sort; the anti-pattern (deep OFFSET pagination = O(offset) work
    per page) is exactly why keyset pagination exists, and a 13-row
    offset is the shallow case the clause is for."""
    return _sql(spark, sf_dir, _OFFSET)


_LISTAGG = """
    SELECT c_nationkey,
           listagg(c_mktsegment, '|')
               WITHIN GROUP (ORDER BY c_mktsegment)      AS segs_all,
           listagg(DISTINCT c_mktsegment, ',')
               WITHIN GROUP (ORDER BY c_mktsegment)      AS segs_distinct,
           CAST(count(*) AS BIGINT)                      AS n_customers
    FROM customer
    WHERE c_custkey % 100 = 0
    GROUP BY c_nationkey
"""


@query(
    "q_sql_listagg",
    oracle="""
        SELECT c_nationkey,
               string_agg(c_mktsegment, '|' ORDER BY c_mktsegment)
                                                         AS segs_all,
               string_agg(DISTINCT c_mktsegment, ','
                          ORDER BY c_mktsegment)         AS segs_distinct,
               CAST(count(*) AS BIGINT)                  AS n_customers
        FROM customer
        WHERE c_custkey % 100 = 0
        GROUP BY c_nationkey
    """,
    description="SQL listagg WITHIN GROUP (Spark 4.0): ordered string aggregation + DISTINCT variant, vs DuckDB string_agg with in-aggregate ORDER BY",
    tags=("golden", "sql", "aggregate"),
)
def q_sql_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``listagg(... ) WITHIN GROUP (ORDER BY ...)`` — the SQL:2016
    ordered string aggregation, new in Spark 4.0 (previously the
    collect_list + array_sort + concat_ws idiom q_agg_string_agg
    documents). Both the ALL form (duplicates kept, deterministic
    in-group order) and the DISTINCT form are pinned; the filter keeps
    groups small so the concatenated values stay comparison-friendly.
    DuckDB spells the same thing string_agg(expr, delim ORDER BY ...).

    Scale shape: a listagg group materializes its group's values in
    one aggregation buffer — ordered-string aggregation is for
    BOUNDED groups (here <= a few segments per nation); unbounded
    concatenation is the documented anti-pattern and belongs in
    collect_list-free designs."""
    return _sql(spark, sf_dir, _LISTAGG)


_PIPE = """
    FROM orders
    |> JOIN customer ON o_custkey = c_custkey
    |> WHERE o_orderstatus = 'F'
    |> EXTEND CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
    |> AGGREGATE CAST(count(*) AS BIGINT) AS n_orders,
                 CAST(sum(cents) AS BIGINT) AS total_cents
       GROUP BY c_mktsegment
    |> ORDER BY c_mktsegment
"""


@query(
    "q_sql_pipe",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)           AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_orderstatus = 'F'
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
    description="SQL pipe syntax (Spark 4.0 |> operators): FROM |> JOIN |> WHERE |> EXTEND |> AGGREGATE ... GROUP BY |> ORDER BY, equal to the nested-SELECT form",
    tags=("golden", "sql", "pipe"),
)
def q_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (r15) — the Spark 4.0 ``|>`` operator chain
    (GoogleSQL's pipe-syntax paper, adopted upstream): each stage
    reads top-to-bottom instead of inside-out, and every stage is one
    of the same relational operators the nested form compiles to.
    Pinned stages: FROM source, JOIN (equi), WHERE after the join,
    EXTEND (projection add, the pipe spelling of a computed column),
    AGGREGATE ... GROUP BY (group columns ride into the output), and
    ORDER BY. The oracle is the exact nested-SELECT desugaring, so the
    key proves the pipe chain is pure syntax — same rows, same types.

    Scale shape: identical to the nested form by construction —
    Catalyst sees ONE logical plan (join -> filter -> project ->
    aggregate), so predicate pushdown, join selection, and the
    map-side-combined aggregate are unchanged; there is no pipe
    "materialization" between stages."""
    return _sql(spark, sf_dir, _PIPE)


@query(
    "q_sql_session_vars",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)           AS total_cents
        FROM orders
        WHERE o_orderkey <= (SELECT max(o_orderkey) // 2 FROM orders)
          AND o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    description="SQL session variables (Spark 4.0): DECLARE / SET VARIABLE from a scalar subquery + EXECUTE IMMEDIATE with USING parameters, vs the inlined oracle",
    tags=("golden", "sql", "variables"),
)
def q_sql_session_vars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables + EXECUTE IMMEDIATE (r15) — the Spark 4.0
    scripting surface: ``DECLARE [OR REPLACE] VARIABLE`` (typed, with
    defaults), ``SET VARIABLE ... = (scalar subquery)`` (the variable
    captures a VALUE at set time, not a view), and ``EXECUTE
    IMMEDIATE '<sql>' USING var, var`` (server-side parameterized
    execution — the injection-safe way to template a query). The
    pinned contract: a cutoff captured from max(o_orderkey) DIV 2 and
    a status literal flow through USING placeholders and produce
    exactly the oracle's inlined result. OR REPLACE keeps the key
    idempotent across repeated calls in one session.

    Scale shape: by the time the plan exists the variables are
    LITERALS — the filter pushes into the parquet scan like any
    constant predicate (no correlated re-evaluation), which is the
    point of capture-at-set semantics."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE cutoff_key BIGINT")
    spark.sql(
        "SET VARIABLE cutoff_key = (SELECT max(o_orderkey) DIV 2 FROM orders)"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE status_pick STRING DEFAULT 'F'")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  CAST(count(*) AS BIGINT) AS n_orders,
                  CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                      AS BIGINT)           AS total_cents
           FROM orders
           WHERE o_orderkey <= ? AND o_orderstatus = ?
           GROUP BY o_orderpriority'
          USING cutoff_key, status_pick
        """
    )


_SQL_UNPIVOT = """
    SELECT o_orderstatus, metric, val FROM (
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS BIGINT)           AS total_cents
        FROM orders GROUP BY o_orderstatus
    ) UNPIVOT (val FOR metric IN (n_orders, total_cents))
"""


@query(
    "q_sql_unpivot",
    oracle="""
        WITH wide AS (
            SELECT o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                       AS BIGINT)           AS total_cents
            FROM orders GROUP BY o_orderstatus
        )
        SELECT o_orderstatus, 'n_orders' AS metric, n_orders AS val FROM wide
        UNION ALL
        SELECT o_orderstatus, 'total_cents' AS metric, total_cents AS val
        FROM wide
    """,
    description="SQL UNPIVOT clause (parser twin of the q_unpivot DataFrame API): wide aggregate back to long, column names become metric labels; oracle is the UNION ALL desugaring",
    tags=("golden", "sql", "unpivot"),
)
def q_sql_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL ``UNPIVOT (val FOR metric IN (...))`` clause (r15,
    Spark 3.4+) — the parser surface of the wide->long melt
    (q_unpivot pins the ``DataFrame.unpivot`` API; this key pins the
    SQL spelling analysts port from warehouses). Semantics pinned:
    unpivoted column NAMES become the label values verbatim, cell
    values carry their common type (BIGINT), and NULL cells are
    EXCLUDED by default — the wide matrix here is dense (count/sum
    over non-empty status groups), so both engines' exclude-NULLs
    defaults agree trivially and the oracle is the plain UNION ALL
    desugaring.

    Scale shape: identical to q_unpivot — Catalyst compiles the
    clause to the same Expand generator (row-local fan-out, output =
    |value columns| x |rows|, no shuffle beyond the upstream
    aggregate's own)."""
    return _sql(spark, sf_dir, _SQL_UNPIVOT)


_GROUP_BY_ALL = """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(count(*) AS BIGINT)   AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
               AS BIGINT)             AS total_cents
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "q_sql_group_by_all",
    oracle=_GROUP_BY_ALL,
    description="GROUP BY ALL + ORDER BY ALL (Spark 4.0 / DuckDB-originated): non-aggregate SELECT columns infer the grouping key, the full output infers the sort — same SQL text both engines",
    tags=("golden", "sql", "aggregate"),
)
def q_sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` (r15) — the
    DuckDB-originated conveniences adopted by Spark 4.0: every
    non-aggregate SELECT column becomes the grouping key, and ORDER
    BY ALL sorts by the full output column list left-to-right, so
    the SAME SQL text runs on both engines and the key pins the
    INFERENCE rules themselves (a column silently dropped from the
    inferred key would change the row count; a different ORDER BY
    ALL ordering contract would still hash-match under the driver's
    order-insensitive compare — the pin is the grouping arity).

    Scale shape: desugars to a plain map-side-combined hash
    aggregate on the two-column key plus a final sort — identical to
    the explicit spelling; inference is parse-time only."""
    return _sql(spark, sf_dir, _GROUP_BY_ALL)
