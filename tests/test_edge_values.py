"""Hostile-value edge corpus: the scalar-function families Spark vs
DuckDB on values the fixture never has.

The TPC-H-shaped fixture is all-positive, all-ASCII, null-free and
pattern-regular, which masks a whole class of engine divergences:
DuckDB RAISES on ln(0)/sqrt(-1)/negative-left-shift/CAST('' AS BIGINT)
where Spark returns NULL (or wraps), so the unguarded expressions only
ever AGREED on benign data. The q_fn_* queries now carry explicit
domain guards (scalars.py); this corpus — zeros, negatives, empty and
unicode strings, pattern-less names, NULL dates/statuses, pre-epoch
and leap-day timestamps, tier-boundary prices — runs every family
end-to-end against the SAME DuckDB oracle the driver uses, so a future
edit that drops a guard fails here rather than on real data.
"""

from __future__ import annotations

import datetime

import pytest

from conftest import make_duck_views, run_parity

_TS = datetime.datetime

# part: p_partkey % 7 == 0 (q_fn_string). Empty/short/unicode/no-vowel
# names, whitespace-only type, negative and over-wide sizes.
PART = [
    (0, "", "", "", 0, 0.0),
    (7, "x", "BR", "  padded type  ", -3, 1.5),
    (14, "école naïve", "Brand#1", "\ttabbed\t", 999999, 2.0),
    (21, "NO LOWERCASE 123", "mixed Case", " ", 5, 3.0),
    (28, "aeiou", "b", "t", 1, 0.5),
    (35, "abcd tail", "BB", "x", 42, 9.9),
]

# orders: %11 (date+bitwise), %13 (cond), >450000 (struct). 0 and
# multiples of 143 pass both mod filters; -143 also does (both engines
# use C-style mod, sign follows the dividend: -143 % 11 == 0).
ORDERS = [
    (0, 1, "O", 0.0, _TS(1969, 12, 31, 23, 59, 59), "1-URGENT"),
    (143, 1, "F", 100000.0, _TS(2024, 2, 29), "5-LOW"),
    (286, 2, "X", 300000.0, _TS(2000, 12, 31, 23, 59, 59), "1-URGENT"),
    (429, 2, None, 449999.99, _TS(1999, 1, 1), None),
    (572, 3, "O", 500000.0, None, "2-HIGH"),
    (715, 3, "F", 460000.0, _TS(2099, 12, 31), "3-MEDIUM"),
    (-143, 4, "P", -5.0, _TS(1970, 1, 1), "4-NOT SPECIFIED"),
    # UDF-filter residues (review r6): the hostile classes existed
    # above but every row dodged the % 100 (q_udf_row_scalar) and % 20
    # (q_udf_grouped_map) slices, leaving the NULL/negative/degenerate
    # divergences latent. 700: NULL price AND NULL priority through
    # both slices (tag must be NULL, not 'None#...'; zscore NULL).
    # -500: negative price through both (floor(-5.5) = -6, never
    # int()'s -5). 220: a single-row priority group (stddev_samp NULL
    # -> zscore NULL, where pandas std is NaN).
    (700, 4, "O", None, _TS(2024, 3, 1), None),
    (-500, 4, "P", -5.5, _TS(2024, 3, 2), "4-NOT SPECIFIED"),
    (220, 1, "O", 123.45, _TS(2024, 3, 3), "9-SOLO"),
]

# lineitem: l_orderkey % 17 == 0 (q_fn_math). Zero/negative quantity
# and price (the sqrt/ln/log10 guard class), huge magnitudes, an exact
# .5 rounding boundary. The "Z" group is zero-variance in BOTH stat
# columns and "Y" in quantity only — the classes where Spark's builtin
# corr/regr_* finals raise DIVIDE_BY_ZERO under ANSI mode; the stats
# aggregates must yield the declared NULL/1.0 forms instead. "R"/"A"
# are single-row groups (n-1 sample aggregates must be NULL).
LINEITEM = [
    (0, 1, 1, 1, 0.0, 0.0, 0.05, 0.0, "N", "O", _TS(2024, 1, 1)),
    (17, 1, 1, 2, -4.0, -123.45, -0.05, 0.0, "R", "F", _TS(2024, 1, 2)),
    (34, 2, 2, 3, 1e9, 1e12, 0.0, 0.1, "A", "F", _TS(2024, 1, 3)),
    (51, 2, 2, 4, 0.5, 100.5, 0.1, 0.2, "N", "O", _TS(2024, 1, 4)),
    (68, 3, 3, 1, 5.0, 30.0, 0.01, 0.0, "Z", "O", _TS(2024, 1, 5)),
    (85, 3, 3, 2, 5.0, 30.0, 0.02, 0.0, "Z", "O", _TS(2024, 1, 6)),
    (102, 4, 4, 1, 3.0, 10.0, 0.03, 0.0, "Y", "F", _TS(2024, 1, 7)),
    (119, 4, 4, 2, 3.0, 20.0, 0.04, 0.0, "Y", "F", _TS(2024, 1, 8)),
    # "W": prices summing to exactly 0 — q_udf_grouped_agg's weighted
    # avg has a zero denominator, which must be NULL on both engines
    # (pandas 0/0 is a NaN VALUE through Arrow — review r6). Keys stay
    # off % 17 == 0 (q_fn_math's slice).
    (3, 5, 5, 1, 1.0, 50.0, 0.1, 0.0, "W", "O", _TS(2024, 1, 9)),
    (5, 5, 5, 2, 1.0, -50.0, 0.2, 0.0, "W", "O", _TS(2024, 1, 10)),
]

# customer: c_name ~ \d\d$ AND c_custkey % 7 == 0 (q_fn_regexp). A
# pattern-less name (parsed_id must be NULL via TRY_CAST, not an
# error), zero-run squeezing, unicode.
CUSTOMER = [
    (0, "Customer#000", 1, 0.0, "BUILDING"),
    (7, "Customer#013", 1, 1.5, "AUTOMOBILE"),
    (14, "no-pattern 99", 2, -2.5, "MACHINERY"),
    (21, "Ω#42", 2, 3.5, "HOUSEHOLD"),
]

# events: event_id % 9 == 0 feeds q_fn_map, == 4 feeds q_fn_json. NULL
# and malformed props, empty/non-object/multi-key documents, null /
# wrong-typed / int32-overflowing / negative values of k. (Wrong-TYPED
# map VALUES go only to the json query — the map query's documented
# contract excludes them.)
EVENTS = [
    (0, _TS(2024, 1, 1), 1, "click", 1.0, None),
    (9, _TS(2024, 1, 1), 1, "click", 1.0, "{bad"),
    (18, _TS(2024, 1, 1), 2, "view", 2.0, "{}"),
    (27, _TS(2024, 1, 1), 2, "view", 2.0, '{"k": null}'),
    (36, _TS(2024, 1, 1), 3, "click", 3.0, '{"a":1,"b":2}'),
    (45, _TS(2024, 1, 1), 3, "view", 3.0, "[1,2]"),
    (54, _TS(2024, 1, 1), 4, "click", 4.0, '{"k": -5}'),
    (4, _TS(2024, 1, 2), 1, "click", 1.0, None),
    (13, _TS(2024, 1, 2), 1, "view", 1.0, "{bad"),
    (22, _TS(2024, 1, 2), 2, "click", 2.0, '{"k": 7}'),
    (31, _TS(2024, 1, 2), 2, "view", 2.0, '{"k": "abc"}'),
    (40, _TS(2024, 1, 2), 3, "click", 3.0, '{"k": null}'),
    (49, _TS(2024, 1, 2), 3, "view", 3.0, '{"k": 2147483648}'),
    (58, _TS(2024, 1, 2), 4, "click", 4.0, "7"),
    (67, _TS(2024, 1, 2), 4, "view", 4.0, '{"k": -12}'),
    # behavioral rows (ids stay off the % 9 in {0, 4} residues feeding
    # the map/json queries): funnel/retention shapes incl. a purchase
    # with no prior signup and one BEFORE the user's signup.
    (1, _TS(2024, 1, 1, 8), 1, "signup", 1.0, None),
    (2, _TS(2024, 1, 1, 9), 1, "purchase", 10.0, None),
    (3, _TS(2024, 1, 2, 9), 1, "purchase", 5.0, None),
    (5, _TS(2024, 1, 1, 8, 30), 2, "signup", 1.0, None),
    (6, _TS(2024, 1, 3), 3, "purchase", 2.0, None),
    (7, _TS(2024, 1, 1, 7), 4, "purchase", 3.0, None),
]

# documents: present only to complete the ten-table surface the SQL
# entry point registers (golden queries never read it; the hostile
# document corpus lives in test_short_text.py).
DOCUMENTS = [
    (0, "a small document", "en", "web", 16),
    (1, "", "en", "wiki", 0),
    # doc_id % 40 == 0 with NULL text: q_udf_udtf must emit zero rows
    # for it like the oracle's string_split(NULL) unnest, never crash
    # on None.split (review r6).
    (40, None, "en", "web", 0),
]

# dims: an empty region name, unicode nation, orphan foreign keys (a
# nation whose region does not exist, a supplier whose nation does
# not), a negative supplier balance.
REGION = [(0, "AMERICA"), (1, "")]
NATION = [(0, "usa", 0), (1, "ñoland", 0), (2, "orphan", 7)]
SUPPLIER = [
    (1, "Supplier#1", 0, -100.5),
    (2, "", 2, 0.0),
    (3, "S3", 9, 1e7),
]

# embeddings: vec_id % 5 == 0 (q_fn_array), % 50 == 0 marks the
# similarity query set. Empty and NULL arrays (outside the similarity
# family's boundary — must be dropped, not crash np.vstack), a ZERO
# vector (no quantization scale), an all-negative vector (pos_sum must
# be 0, not NULL), 3-dim throughout (the sim family's dim-uniformity
# contract; q_fn_array additionally must index size-relative, never a
# hardcoded fixture dim). Values are exactly f32-representable so the
# f32->f64 widening both engines do stays bit-exact.
EMBEDDINGS = [
    (0, [], 0),
    (5, None, 1),
    (10, [0.5, -1.25, 3.0], 2),
    (15, [-1.0, -2.0, -0.5], 3),
    (20, [0.0, 0.0, 0.0], 4),
    (25, [1.0, 0.0, 0.0], 5),
    (50, [0.0, 1.0, 0.0], 6),
    # NaN / NULL ELEMENTS: outside the similarity family's boundary
    # (VEC_BOUNDARY_SQL / _as_double) — must be excluded symmetrically
    # on both engines, never scored (NaN dots rank first in DuckDB,
    # -inf in the kernels; NaN*scale ANSI-floors wrap where DuckDB
    # raises — review r6). ids avoid % 5 == 0 (q_fn_array's slice) and
    # % 50 == 0 (the query set) so they sit on the corpus side.
    (31, [float("nan"), 1.0, 0.0], 7),
    (36, [1.0, None, 2.0], 8),
]

SCHEMAS = {
    "part": (
        PART,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ),
    "orders": (
        ORDERS,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ),
    "lineitem": (
        LINEITEM,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ),
    "customer": (
        CUSTOMER,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ),
    "events": (
        EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ),
    "embeddings": (
        EMBEDDINGS,
        "vec_id long, embedding array<float>, label int",
    ),
    "documents": (
        DOCUMENTS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ),
    "region": (REGION, "r_regionkey int, r_name string"),
    "nation": (NATION, "n_nationkey int, n_name string, n_regionkey int"),
    "supplier": (
        SUPPLIER,
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    ),
}

KEYS = [
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
    "q_fn_cond",
    "q_fn_regexp",
    "q_fn_bitwise",
    "q_fn_struct",
    "q_fn_array",
    "q_fn_map",
    "q_fn_json",
    # statistical aggregates over the zero-variance / single-row groups
    "q_agg_stats",
    "q_agg_corr",
    "q_agg_percentile",
    "q_agg_histogram",
    # the broader batch-relational surface on the same hostile corpus:
    # every key here reads only tables the corpus provides, and several
    # filters now select EMPTY inputs (e.g. all shipdates postdate the
    # TPC-H windows) — the degenerate empty-input class rides along.
    "q_project",
    "q_filter_compare",
    "q_filter_in_between_like",
    "q_filter_null",
    "q_distinct",
    "q_join_inner_equi",
    "q_join_broadcast",
    "q_join_left",
    "q_join_right",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_cross",
    "q_join_theta",
    "q_join_range",
    "q_join_asof",
    "q_set_union",
    "q_set_union_distinct",
    "q_set_intersect",
    "q_set_except",
    "q_sort_multi",
    "q_topk_global",
    "q_win_ranking",
    "q_win_lag_lead",
    "q_win_frame_rows",
    "q_win_frame_range",
    "q_win_value_family",
    "q_win_topk_group",
    "q_ts_gapfill",
    "q_ts_ohlc",
    "q_ts_sessionize",
    "q_ts_funnel",
    "q_ts_retention",
    "q_ts_session_window",
    # round-8 additions over the same hostile events/lineitem surface
    "q_ts_interpolate",
    "q_join_interval_overlap",
    "q_agg_mode",
    "q_agg_bitmap_distinct",
    "q_agg_histogram_quantile",
    "q_ts_gap_islands",
    "q_ts_outlier_mad",
    "q_sample_group_topk",
    "q_scan_schema_evolution",
    "q_unpivot",
    "q_subquery_not_in",
    "q_join_null_safe",
    "q_agg_weighted_median",
    "q_win_running_distinct",
    "q_join_asof_nearest",
    "q_join_asof_tolerance",
    "q_agg_bool",
    # session-3 additions over the same hostile surface: zero-variance
    # series (cusum/rolling-corr/peaks/seasonal NULL paths), degenerate
    # embeddings (boundary-excluded), malformed props (variant typed
    # NULLs), extreme prices (decimal range), partial MERGE snapshots.
    "q_ts_rolling_corr",
    "q_ts_ewma",
    "q_ts_cusum",
    "q_ts_peak_detect",
    "q_ts_seasonal_hod",
    "q_ts_median_filter",
    "q_agg_skew_salted",
    # round-9 additions: tiny/degenerate graphs (possibly zero edges),
    # zero-variance regressors (regr_* NULL paths), NULL-text docs in
    # the hash/shingle pipelines, single-arm A/B splits, all-NULL
    # snapshot-compare groups
    "q_graph_degree",
    "q_graph_triangles",
    "q_graph_pagerank",
    "q_graph_bfs",
    "q_graph_common_neighbors",
    "q_anon_kanonymity",
    "q_fn_try_arith",
    "q_fn_hash",
    "q_fn_url_parse",
    "q_agg_linear_regr",
    "q_events_ab_test",
    "q_llm_zipf_slope",
    "q_llm_vocab_growth",
    "q_llm_dup_ngram_coverage",
    "q_llm_ngram_novelty",
    "q_llm_safety_wordlist",
    "q_llm_domain_cap",
    "q_llm_snapshot_diff",
    "q_llm_lsh_audit",
    "q_graph_wcc",
    "q_agg_moments",
    "q_embed_label_separation",
    "q_agg_decimal_exact",
    "q_dq_profile",
    "q_merge_upsert",
    "q_fn_variant",
    "q_join_bloom_runtime",
    "q_embed_centroid_stats",
    # round-10 additions over the same hostile surface: negative /
    # NULL prices (weighted-sample thresholds, gini cents, DQ rule
    # counters), NULL priorities (l-diversity sensitive NULLs,
    # markov lag chains), degenerate graphs (k-core empty/absent),
    # hostile part names (fuzzy blocks of size 1, unicode lev)
    "q_sample_weighted",
    "q_agg_gini",
    "q_events_attribution",
    "q_events_markov",
    "q_anon_ldiversity",
    "q_dq_rules",
    "q_graph_kcore",
    "q_join_fuzzy_block",
    "q_llm_shard_assign",
    "q_agg_pareto",
    "q_graph_assortativity",
    "q_ts_time_bucket",
    "q_scan_multi_source",
    "q_set_symdiff",
    "q_fn_try_datetime",
    "q_stream_cdc_apply",
    "q_scan_backfill_union",
    "q_agg_rfm",
    "q_ts_cohort_ltv",
    "q_agg_sketch_audit",
    # round-11 batch 1 (the vwap guard class lives here: zero/negative
    # quantity sums must NULL the floor-division, never raise/diverge)
    "q_ts_drawdown",
    "q_events_streaks",
    "q_ts_vwap",
    "q_dq_benford",
    "q_agg_basket_pairs",
    # round-11 batch 2
    "q_graph_modularity",
    "q_graph_local_clustering",
    "q_events_path_topk",
    "q_agg_count_min",
    # round-11 batch 3 (NULL/empty documents sit OUTSIDE the shared
    # text boundary; key 0 exercises the spatial origin cell)
    "q_llm_tokenizer_fertility",
    "q_llm_quality_ensemble",
    "q_llm_curriculum",
    "q_join_spatial_grid",
    # round-11 batch 4
    "q_events_sequence_next",
    "q_agg_hist2d",
    # round-11 batch 5 (NULL priorities sit outside the t-closeness
    # boundary; negative spends exercise the HHI integer arithmetic)
    "q_anon_tcloseness",
    "q_agg_herfindahl",
    "q_events_inter_arrival",
    "q_sql_view_chain",
    # round-11 batch 6
    "q_llm_oov_rate",
    "q_events_anomaly_days",
    "q_agg_group",
    "q_agg_global",
    "q_agg_count_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_pivot",
    "q_agg_collect",
    "q_agg_grouping_sets",
    "q_tpch_q3",
    "q_tpch_q5",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q10",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q16",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q22",
    "q_tpch_q4",
    "q_tpch_q8",
    "q_tpch_q12",
    "q_tpch_q15",
    "q_tpch_q17",
    "q_tpch_q21",
    "q_subquery_scalar",
    "q_subquery_correlated",
    # round-12 additions over the same hostile surface: purchase-before-
    # signup rows (survival/step-latency strict ordering), single-member
    # cohorts (median_rn == p90_rn == 1), tiny/zero-edge graphs (LPA),
    # NULL order dates (month arithmetic), empty/NULL documents
    # (collation regex prune, temperature mix), sub-minute event spans
    # (freshness lag, concurrency sweep), empty bot screens
    "q_tpch_q1",
    "q_events_pattern_funnel",
    "q_agg_argmax",
    "q_agg_bitops",
    "q_agg_chi2",
    "q_events_concurrency",
    "q_events_step_latency",
    "q_ts_sax",
    "q_sql_lateral_join",
    "q_sql_recursive_cte",
    "q_dq_psi",
    "q_anon_generalize",
    "q_llm_mix_temperature",
    "q_dq_freshness",
    "q_anon_dp_counts",
    "q_fn_month_arith",
    "q_fn_collation",
    "q_events_bot_screen",
    "q_graph_label_propagation",
    "q_events_survival",
    "q_dq_referential",
    "q_llm_dataset_card",
    "q_agg_winsorized",
    "q_join_point_in_time",
    "q_agg_theil",
    # scans/sinks/samples/merge re-write and re-read the hostile rows
    # through every format (csv/orc/json/text-lines incl. the \\N null
    # sentinel), and the UDF surface crosses them through Arrow.
    "q_scan_parquet",
    "q_scan_csv_json",
    "q_scan_csv_file",
    "q_scan_text_lines",
    "q_scan_orc",
    "q_scan_json_corrupt",
    "q_sink_sorted",
    "q_sink_zorder",
    "q_sink_compact",
    "q_sink_partitioned",
    "q_join_dpp",
    "q_join_bucketed",
    "q_join_skew_salted",
    "q_merge_scd2",
    "q_sample_hash",
    "q_sample_stratified",
    "q_udf_row_scalar",
    "q_udf_pandas_scalar",
    "q_udf_iter_pandas",
    "q_udf_grouped_agg",
    "q_udf_grouped_map",
    "q_udf_map_in_arrow",
    "q_udf_udtf",
    # the exact-tier similarity family over the degenerate-vector
    # corpus (NULL/empty dropped at the family boundary, zero vector
    # quantizes to a NULL scale instead of dividing by zero)
    "q_llm_sim_topk",
    "q_llm_embed_neardup",
    "q_llm_embed_quantize",
    "q_llm_sim_topk_quant",
    # the streaming rig replayed over the hostile events table
    # (batch-equivalence oracles, same as the driver's check)
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_static_join",
    "q_stream_stream_join",
    "q_stream_stateful_alerts",
    "q_stream_corpus_ingest",
    "q_stream_foreach_upsert",
]


@pytest.fixture(scope="module")
def edge_sf_dir(spark, tmp_path_factory):
    sf_dir = tmp_path_factory.mktemp("edge_sf")
    for table, (rows, schema) in SCHEMAS.items():
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(sf_dir / f"{table}.parquet"))
    return str(sf_dir)


@pytest.fixture(scope="module")
def edge_duck(edge_sf_dir):
    con = make_duck_views(edge_sf_dir, tables=list(SCHEMAS))
    yield con
    con.close()


@pytest.mark.parametrize("name", KEYS)
def test_fn_family_on_edge_values(spark, edge_sf_dir, edge_duck, name):
    run_parity(spark, edge_duck, name, edge_sf_dir)


@pytest.fixture(scope="module")
def const_sf_dir(spark, tmp_path_factory):
    # Every event carries the SAME value: the histogram's data-driven
    # bounds collapse (v1 == v0) and the unguarded bin expression is
    # 0/0 — which raises on BOTH engines (ANSI divide-by-zero / NaN
    # cast). The guard must fold the whole table into bin 0.
    sf_dir = tmp_path_factory.mktemp("const_sf")
    rows = [
        (i, _TS(2024, 1, 1 + i % 3), i % 4, "click", 5.0, '{"k": 1}')
        for i in range(20)
    ]
    spark.createDataFrame(rows, SCHEMAS["events"][1]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(sf_dir / "events.parquet"))
    return str(sf_dir)


def test_histogram_on_constant_values(spark, const_sf_dir):
    from sparkstreamingtohdfsofsensorsdata_spark import registry

    con = make_duck_views(const_sf_dir, tables=["events"])
    try:
        run_parity(spark, con, "q_agg_histogram", const_sf_dir)
        rows = registry.load_all()["q_agg_histogram"].fn(
            spark, const_sf_dir
        ).collect()
        assert [(r["bin"], r["n"]) for r in rows] == [(0, 20)]
    finally:
        con.close()


def test_zorder_on_constant_values(spark, const_sf_dir):
    # Same degenerate class as the histogram: an all-equal value column
    # collapses the z-order value dimension's range to zero, which
    # raised DIVIDE_BY_ZERO under ANSI instead of degrading to one bin
    # (review r6). The layout degrades; the read-back aggregates must
    # still be exact.
    con = make_duck_views(const_sf_dir, tables=["events"])
    try:
        run_parity(spark, con, "q_sink_zorder", const_sf_dir)
    finally:
        con.close()
