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
