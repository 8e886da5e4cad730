"""Query registry: the single source of truth for the driver contract.

Every operator module registers its queries here with the ``@query``
decorator. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over this registry, and the local parity tests iterate it, so an
operator is "declared done" in exactly one place.

``oracle`` is the DuckDB-runnable ANSI SQL equivalent; ``None`` marks a
genuinely non-SQL-expressible op (the driver then records a weaker
rows-only check — SURVEY.md §5.2).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    # Declared rounding precision per output column (column name -> dp):
    # a declared column additionally tolerates a single 10^-dp last-digit
    # flip at ANY magnitude in the tolerant comparator (ADVICE r6,
    # conftest._declared_step_equal). Round-10 census (VERDICT r9 item
    # 6): the zero-tolerance exact sweep proved every then-existing
    # declaration (63) unnecessary at sf0.001/0.01/0.1, so ALL were
    # deleted — declarations mask divergence the driver's exact hash
    # would catch. The mechanism stays for a future key that genuinely
    # rounds coarser than the magnitude heuristic infers; any new
    # declaration must come with an exact-sweep exception note in
    # SCALE.md.
    float_dp: dict[str, int] = field(default_factory=dict)


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    description: str = "",
    tags: tuple[str, ...] = (),
    float_dp: dict[str, int] | None = None,
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the Spark implementation of query ``name``."""

    def decorate(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Timestamp semantics must not depend on the caller's session:
            # parquet instants are rendered in session TZ, and the DuckDB
            # oracle is UTC-naive — pin UTC so both sides agree.
            spark.conf.set("spark.sql.session.timeZone", "UTC")
            # Nor may results depend on the caller's cwd: ship this
            # package to Python workers so by-reference cloudpickled
            # UDFs import cleanly everywhere (see ensure_package_on_workers).
            from .session import ensure_package_on_workers

            ensure_package_on_workers(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        # next(iter(...), "") tolerates a whitespace-only docstring — a
        # bare [0] here would IndexError at import time and take the
        # whole registry down with it.
        doc_first = next(iter((fn.__doc__ or "").strip().splitlines()), "")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=wrapped,
            oracle=oracle,
            description=description or doc_first,
            tags=tuple(tags),
            float_dp=dict(float_dp or {}),
        )
        # Return the WRAPPED callable, so the module-level name carries
        # the same UTC-pin + package-ship guarantees as the registry
        # entry: a consumer importing golden.q_tpch_q3 directly on a
        # non-UTC session used to bypass both and silently diverge from
        # the oracle (review r6).
        return wrapped

    return decorate


# External harnesses may verify only a prefix of the registry (observed:
# 50 keys/round). Listing keys here pins them to the front so every key
# accumulates a verdict across rounds. Round-10 rotation (VERDICT r9 item
# 3): the r9 driver consumed exactly the previous head-50, so that window
# moves to the tail; the new head is (a) the two keys whose r9 driver
# hash FAILED and were fixed this round (q_ts_cusum, q_agg_decimal_exact
# — they need a green r10 row), then (b) the three keys never
# driver-checked since their oracles were upgraded (q_agg_approx_distinct,
# q_agg_hll_union, q_llm_sim_topk_lsh), then (c) every remaining key in
# ascending order of its freshest driver verdict (computed by set-union
# over CORRECTNESS_r1..r9 — the r4/r5 cohort leads). Overlap of the new
# head-50 with the r9 window: exactly the 2 fixed keys.
VERIFICATION_PRIORITY: tuple[str, ...] = (
    # round-10 additions (never driver-checked — newest surface first)
    "q_fn_try_datetime",
    "q_stream_cdc_apply",
    "q_scan_backfill_union",
    "q_agg_rfm",
    "q_ts_cohort_ltv",
    "q_agg_sketch_audit",
    "q_agg_pareto",
    "q_graph_assortativity",
    "q_ts_time_bucket",
    "q_scan_multi_source",
    "q_set_symdiff",
    "q_sample_weighted",
    "q_agg_gini",
    "q_events_attribution",
    "q_events_markov",
    "q_anon_ldiversity",
    "q_dq_rules",
    "q_graph_kcore",
    "q_join_fuzzy_block",
    "q_llm_shard_assign",
    "q_ts_cusum",
    "q_agg_decimal_exact",
    "q_agg_approx_distinct",
    "q_agg_hll_union",
    "q_llm_sim_topk_lsh",
    "q_stream_corpus_ingest",
    "q_scan_parquet",
    "q_join_inner_equi",
    "q_join_broadcast",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_theta",
    "q_join_range",
    "q_join_asof",
    "q_agg_global",
    "q_agg_group",
    "q_agg_count_distinct",
    "q_agg_percentile",
    "q_win_ranking",
    "q_win_lag_lead",
    "q_win_frame_rows",
    "q_win_frame_range",
    "q_win_topk_group",
    "q_sort_multi",
    "q_topk_global",
    "q_project",
    "q_filter_compare",
    "q_filter_in_between_like",
    "q_filter_null",
    "q_distinct",
    "q_set_union",
    "q_set_union_distinct",
    "q_set_except",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_pivot",
    "q_agg_collect",
    "q_agg_grouping_sets",
    "q_join_cross",
    "q_subquery_scalar",
    "q_subquery_correlated",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q10",
    "q_sink_partitioned",
    "q_limit",
    "q_udf_pandas_scalar",
    "q_udf_row_scalar",
    "q_udf_grouped_agg",
    "q_udf_iter_pandas",
    "q_udf_udtf",
    "q_udf_grouped_map",
    "q_udf_map_in_arrow",
    "q_llm_exact_dedup",
    "q_llm_minhash_lsh",
    "q_llm_simhash",
    "q_llm_simhash_banded",
    "q_llm_dedup_clusters",
    "q_llm_text_stats",
    "q_llm_quality",
    "q_llm_lang_id",
    "q_llm_tfidf",
    "q_llm_fingerprint",
    "q_llm_corpus_prep",
    "q_llm_repetition",
    "q_llm_tokenize_vocab",
    "q_llm_bpe_train",
    "q_llm_chunk",
    "q_llm_pack",
    "q_llm_contamination",
    "q_llm_split_leakage",
    "q_llm_domain_stats",
    "q_scan_text_lines",
    "q_sink_compact",
    "q_join_dpp",
    "q_scan_orc",
    "q_scan_csv_file",
    "q_sink_sorted",
    "q_scan_json_corrupt",
    "q_sink_zorder",
    "q_sample_hash",
    "q_sample_stratified",
    "q_join_skew_salted",
    "q_join_bucketed",
    "q_win_value_family",
    "q_merge_scd2",
    "q_set_intersect",
    "q_fn_string",
    "q_fn_date",
    "q_fn_cond",
    "q_fn_struct",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q16",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_ts_gapfill",
    "q_ts_ohlc",
    "q_ts_sessionize",
    "q_ts_funnel",
    "q_ts_session_window",
    "q_ts_retention",
    "q_llm_dedup_keep",
    "q_llm_mix_sample",
    "q_stream_foreach_upsert",
    "q_llm_multimodal",
    "q_llm_multimodal_frames",
    "q_llm_multimodal_audio",
    "q_agg_stats",
    "q_agg_corr",
    "q_agg_histogram",
    "q_fn_math",
    "q_fn_regexp",
    "q_fn_bitwise",
    "q_fn_array",
    "q_fn_map",
    "q_fn_json",
    "q_scan_csv_json",
    "q_llm_pii_redact",
    "q_tpch_q2",
    "q_tpch_q9",
    "q_llm_semdedup",
    "q_agg_heavy_hitters",
    "q_tpch_q11",
    "q_tpch_q20",
    "q_unpivot",
    "q_subquery_not_in",
    "q_join_null_safe",
    "q_agg_weighted_median",
    "q_win_running_distinct",
    "q_join_asof_nearest",
    "q_stream_stream_left_join",
    "q_llm_url_normalize",
    "q_tpch_q4",
    "q_tpch_q8",
    "q_tpch_q12",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_llm_ngram_containment",
    "q_llm_passage_dedup",
    "q_agg_histogram_quantile",
    "q_stream_update_mode",
    "q_ts_gap_islands",
    "q_ts_outlier_mad",
    "q_llm_dedup_incremental",
    "q_llm_length_bucket",
    "q_llm_split_assign",
    "q_llm_unigram_logprob",
    "q_agg_mode",
    "q_join_interval_overlap",
    "q_ts_interpolate",
    "q_agg_bitmap_distinct",
    "q_sample_group_topk",
    "q_scan_schema_evolution",
    "q_llm_ngram_jaccard",
    "q_llm_boilerplate",
    "q_llm_sim_topk",
    "q_llm_sim_topk_quant",
    "q_llm_sim_topk_ivf",
    "q_llm_embed_quantize",
    "q_llm_embed_neardup",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_stateful_alerts",
    "q_scan_csv_malformed",
    "q_agg_bool",
    "q_join_asof_tolerance",
    "q_graph_wcc",
    "q_agg_moments",
    "q_embed_label_separation",
    "q_graph_bfs",
    "q_fn_hash",
    "q_llm_snapshot_diff",
    "q_llm_lsh_audit",
    "q_fn_url_parse",
    "q_agg_linear_regr",
    "q_llm_safety_wordlist",
    "q_llm_domain_cap",
    "q_events_ab_test",
    "q_graph_common_neighbors",
    "q_fn_try_arith",
    "q_graph_degree",
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_anon_kanonymity",
    "q_llm_zipf_slope",
    "q_llm_vocab_growth",
    "q_llm_dup_ngram_coverage",
    "q_llm_ngram_novelty",
    "q_agg_skew_salted",
    "q_dq_profile",
    "q_ts_rolling_corr",
    "q_llm_pmi_bigrams",
    "q_llm_entropy",
    "q_llm_feature_hash",
    "q_ts_ewma",
    "q_llm_bigram_lm",
    "q_merge_upsert",
    "q_stream_chained_windows",
    "q_llm_source_overlap",
    "q_embed_centroid_stats",
    "q_ts_peak_detect",
    "q_ts_seasonal_hod",
    "q_ts_median_filter",
    "q_fn_variant",
    "q_join_bloom_runtime",
    "q_llm_winnowing",
    "q_agg_string_agg",
    "q_ts_autocorr",
    "q_scan_binary",
    "q_sink_csv_roundtrip",
    "q_stream_sink",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registry population),
    then order the returned mapping by verification priority: keys in
    ``VERIFICATION_PRIORITY`` first (in that order), the rest in
    registration order. A harness that truncates to a prefix therefore
    always covers the keys most in need of a verdict.
    """
    # Imports are local to avoid a cycle: operator modules import `query`
    # from this module at their import time.
    from .functions import scalars, udfs  # noqa: F401
    from . import llm, streaming  # noqa: F401
    from .functions import collections  # noqa: F401
    from . import golden, operators  # noqa: F401

    front = [k for k in VERIFICATION_PRIORITY if k in REGISTRY]
    ordered = {k: REGISTRY[k] for k in front}
    ordered.update((k, v) for k, v in REGISTRY.items() if k not in ordered)
    return ordered


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracles() -> dict[str, str]:
    return {
        name: spec.oracle for name, spec in load_all().items() if spec.oracle is not None
    }
