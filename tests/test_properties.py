"""Property-based relational-algebra invariants (SURVEY.md §5.4).

Randomized small relations through the same DataFrame operators the
registered queries use; each property is an algebraic law that must
hold for ANY input, so these catch semantic drift the fixture-pinned
oracle tests cannot (e.g. null-key join behavior, except/intersect
multiplicity). Row counts are kept tiny and examples few: the cost is
Spark job latency, not data size.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# Rows: (key, value) with nullable keys — nulls never equi-join-match,
# which is exactly the edge the properties below pin down.
rows = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(0, 5)),
        st.integers(-100, 100),
    ),
    min_size=0,
    max_size=12,
)

SCHEMA = "k int, v int"

PROP = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame(data, SCHEMA)


@PROP
@given(a=rows, b=rows)
def test_left_join_preserves_left_cardinality_on_unique_right(spark, a, b):
    # Dedup right keys so the left side can't fan out: then
    # count(a LEFT JOIN b) == count(a), null keys included (they
    # survive as unmatched rows).
    left = _df(spark, a)
    right = _df(spark, b).dropDuplicates(["k"]).withColumnRenamed("v", "w")
    joined = left.join(right, "k", "left")
    assert joined.count() == left.count()


@PROP
@given(a=rows, b=rows)
def test_semi_plus_anti_partition_left(spark, a, b):
    # Semi and anti joins partition the left relation exactly.
    left, right = _df(spark, a), _df(spark, b)
    semi = left.join(right, "k", "left_semi").count()
    anti = left.join(right, "k", "left_anti").count()
    assert semi + anti == left.count()


@PROP
@given(a=rows, b=rows)
def test_union_all_counts_add(spark, a, b):
    assert _df(spark, a).union(_df(spark, b)).count() == len(a) + len(b)


@PROP
@given(a=rows, b=rows)
def test_except_all_multiplicity(spark, a, b):
    # exceptAll removes one occurrence per right-side match:
    # count(a EXCEPT ALL b) == count(a) - count(a INTERSECT ALL b).
    left, right = _df(spark, a), _df(spark, b)
    except_all = left.exceptAll(right).count()
    intersect_all = left.intersectAll(right).count()
    assert except_all == left.count() - intersect_all


@PROP
@given(a=rows)
def test_groupby_sum_equals_global_sum(spark, a):
    # Partial/final aggregation decomposition: per-key sums re-summed
    # equal the ungrouped sum (null key forms its own group).
    from pyspark.sql import functions as F

    df = _df(spark, a)
    grouped = df.groupBy("k").agg(F.sum("v").alias("s"))
    regrouped = grouped.agg(F.sum("s").alias("t")).collect()[0]["t"]
    total = df.agg(F.sum("v").alias("t")).collect()[0]["t"]
    assert regrouped == total
