"""ANN quality gates: the approximate tiers must actually approximate.

Both ANN queries return per-query recall@k against the exact top-k, so
"is the accuracy/cost trade acceptable" is a measured assertion, not a
claim. Floors are loose: the fixture embeddings are uniform random
(no cluster structure), the hardest case for space-partitioning ANN.
"""

from __future__ import annotations

from sparkstreamingtohdfsofsensorsdata_spark import registry

SF = "/root/testdata/sf0.01"


def _mean_recall(spark, name: str) -> float:
    rows = registry.load_all()[name].fn(spark, SF).collect()
    assert rows, f"{name} returned no per-query rows"
    return sum(r.recall_at_k for r in rows) / len(rows)


def test_ivf_recall_floor(spark):
    assert _mean_recall(spark, "q_llm_sim_topk_ivf") >= 0.25


def test_lsh_recall_floor(spark):
    assert _mean_recall(spark, "q_llm_sim_topk_lsh") >= 0.25
