"""PySpark-native analytics engine with the query/data-processing surface
of ``shapeandshare/dicebox.sensorybatchprocessor`` (see SURVEY.md).

The reference (SURVEY.md §1.1) is a streaming-ingest → batch-persist ML
data preprocessor; this engine re-expresses that surface — plus the full
relational/window/streaming/LLM-pipeline operator inventory of SURVEY.md
§2 — as idiomatic Spark SQL / DataFrame plans.

Public API:
    get_session()      — SparkSession with the engine config profile (§4)
    load()/load_all()  — fixture loaders with the events ns-ts repair
    all_queries()      — {name: QuerySpec} for every registered operator
"""

from __future__ import annotations

from dicebox_sensorybatchprocessor_spark.io import TABLES, load, load_all
from dicebox_sensorybatchprocessor_spark.registry import QUERIES, QuerySpec
from dicebox_sensorybatchprocessor_spark.session import ensure_engine_conf, get_session

_OPERATOR_MODULES = (
    "dicebox_sensorybatchprocessor_spark.sources.scans",
    "dicebox_sensorybatchprocessor_spark.sources.nested",
    "dicebox_sensorybatchprocessor_spark.operators.relational",
    "dicebox_sensorybatchprocessor_spark.operators.joins",
    "dicebox_sensorybatchprocessor_spark.operators.aggregates",
    "dicebox_sensorybatchprocessor_spark.operators.windows",
    "dicebox_sensorybatchprocessor_spark.operators.setops",
    "dicebox_sensorybatchprocessor_spark.operators.scale",
    "dicebox_sensorybatchprocessor_spark.operators.sqlapi",
    "dicebox_sensorybatchprocessor_spark.operators.sqldeep",
    "dicebox_sensorybatchprocessor_spark.operators.sampling",
    "dicebox_sensorybatchprocessor_spark.operators.sketches",
    "dicebox_sensorybatchprocessor_spark.operators.analytics",
    "dicebox_sensorybatchprocessor_spark.operators.maintenance",
    "dicebox_sensorybatchprocessor_spark.operators.quality",
    "dicebox_sensorybatchprocessor_spark.operators.lakeops",
    "dicebox_sensorybatchprocessor_spark.functions.families",
    "dicebox_sensorybatchprocessor_spark.llm.udx",
    "dicebox_sensorybatchprocessor_spark.llm.dedup",
    "dicebox_sensorybatchprocessor_spark.llm.corpus",
    "dicebox_sensorybatchprocessor_spark.llm.similarity",
    "dicebox_sensorybatchprocessor_spark.llm.text",
    "dicebox_sensorybatchprocessor_spark.llm.multimodal",
    "dicebox_sensorybatchprocessor_spark.llm.pipelines",
    "dicebox_sensorybatchprocessor_spark.llm.curation",
    "dicebox_sensorybatchprocessor_spark.streaming.streams",
)


# Driver-facing query order. The driver's correctness harness checks the
# FIRST 50 registered queries each round (CORRECTNESS_r0N.json == exactly
# list(all_queries())[:50]), so ordering is the verification budget.
#
# The driver window size the rotation below is planned against.
DRIVER_WINDOW = 50

# Round-8 window (VERDICT r7 Next #1 — execute the staleness ledger's r8
# slice). Composition, in order:
#   [head]  queries whose backing code is touched IN round 8, at the
#           function granularity tests/test_window_rotation.py now
#           enforces (manifest-commit protocol under stream_upsert_merge
#           / maintenance_compact, streaming api faces, mm codec hook,
#           IVF persistence, dedup_pipeline routing, decontaminate /
#           dq_drift / union-find ADVICE fixes). Regenerate with
#           `python scripts/plan_window.py --tuple` after any refactor —
#           the rotation test fails if this head goes stale.
#   [fill]  the NOTES.md "Registry staleness ledger" r8 slice, oldest
#           driver-green first: all 33 r1-stale queries, then the r2
#           head as slots allow (displaced r2 items move to the r9
#           slice).
# Entries beyond the 50-slot window keep the round-7 ordering as a
# stable tail (the all_queries() loop skips duplicates).
_ROUND8_PRIORITY = (
    # -- touched since last round boundary (required) --
    "stream_upsert_merge",
    "maintenance_compact",
    "stream_dedup",
    "stream_dedup_wm",
    "stream_quarantine",
    "dq_drift",
    "dedup_survivors",
    "dedup_clusters",
    "mm_image_resize",
    "mm_audio_feature",
    "decontaminate_ngram",
    "decontaminate_bloom",
    "sim_ann_ivf_persisted",
    "mm_image_meta",
    # -- round 9 additions (no CORRECTNESS_r08 was recorded — the r8
    # boundary commit never landed — so the r8 window composition stays
    # live and new queries join its touched head; regenerated with
    # scripts/plan_window.py --tuple) --
    "lake_cdc_apply",
    "lake_incremental_mv",
    "lake_zorder_skip",
    "events_twap",
    "lake_compact_small",
    "stream_lake_mv",
    "lake_merge_into",
    "events_ohlc",
    "events_resample",
    "lake_constraints_restore",
    "lake_update_delete",
    "sim_pq_topk",
    "stream_lake_cdc",
    "agg_weighted_percentiles",
    # -- oldest-driver-green rotation fill --
    "agg_minmax_by",  # last green r1
    "scan_parquet",  # last green r1
    "scan_csv_json",  # last green r1
    "sink_parquet_part",  # last green r1
    "filter_cmp",  # last green r1
    "filter_in",  # last green r1
    "filter_between",  # last green r1
    "filter_like",  # last green r1
    "filter_null",  # last green r1
    "cond_case",  # last green r1
    "cast_try",  # last green r1
    "sort_multi",  # last green r1
    "limit_topk",  # last green r1
    "distinct_rows",  # last green r1
    "project_unpivot",  # last green r1
    "join_inner",  # last green r1
    "join_left",  # last green r1
    "join_right",  # last green r1
    "join_full",  # last green r1
    "join_anti",  # last green r1
    "join_cross",  # last green r1
    "join_theta",  # last green r1
    "join_range",  # last green r1
    "join_agg_revenue_by_nation",  # last green r1
    "agg_hash",  # last green r1
    "agg_global",  # last green r1
    "agg_distinct",  # last green r1
    "agg_filtered",  # last green r1
    "agg_cube",  # last green r1
    "agg_collect",  # last green r1
    "agg_stats",  # last green r1
    "events_tumbling",  # last green r1
    "union_all",  # last green r1
    "text_langid",  # last green r2
    "text_fingerprint",  # last green r2
    "join_bucketed",  # last green r2
    "fn_struct",  # last green r2
)

# Round-7 window (VERDICT r6 Next #1 — the rotation task r5 planned and
# r6 failed to execute). Composition, in order:
#   [1-30]  the 30 queries whose backing module was refactored in round 6
#           AFTER their last driver row (VERDICT r6 "What's missing #1"
#           names the full list): similarity (7, llm/similarity.py,
#           commit 44710bb), windows (9, operators/windows.py, 44710bb),
#           analytics (9, operators/analytics.py, 44710bb — the other 4
#           analytics queries sat in the r6 window and so already carry
#           post-refactor rows), corpus (3, llm/corpus.py), sampling
#           (2, operators/sampling.py + api.py carving work, 31b7231).
#   [31-49] queries whose backing code is touched IN round 7: the
#           dq/maintenance families gaining df-level API twins (VERDICT
#           r6 Next #4) plus the NEW dq_drift / sample_cap_per_group /
#           dedup_survivors operators, the ENTIRE llm/dedup.py registry
#           (the module hosts the new connected-components/keep-one API
#           seam, so every query it defines goes stale together — the
#           module granularity the staleness ledger uses), and the
#           registered queries backed by the api.py functions fixed per
#           ADVICE r6 (funnel '_t' collision -> events_funnel;
#           hash_split zero-weight -> split_train_val_test).
#   [50]    oldest-green rotation: one round-1-stale sentinel (see
#           NOTES.md "driver-window rotation schedule" for the r8/r9
#           slices covering the rest of the r1-r3 backlog the
#           touched-family fronting displaced).
# Pre-validated with scripts/simulate_window.py; tests/
# test_window_rotation.py enforces "touched since last round => in
# window" from git history, so this list can no longer silently rot.
# Entries 51+ keep the round-5 ordering as a stable tail (the
# all_queries() loop skips duplicates).
_ROUND7_PRIORITY = (
    # -- [1-7] similarity family (llm/similarity.py touched r6) --
    "sim_cosine_topk",
    "sim_knn_query",
    "vec_norm",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "emb_label_centroid_dist",
    "emb_label_margin",
    # -- [8-16] windows family (operators/windows.py touched r6) --
    "win_rank",
    "win_lag_lead",
    "win_first_last",
    "win_frame_rows",
    "win_frame_range",
    "win_topk_group",
    "win_distribution",
    "win_running_distinct",
    "sessionize_batch",
    # -- [17-25] analytics family (operators/analytics.py touched r6) --
    "agg_histogram",
    "agg_mode",
    "agg_rollup_incremental",
    "events_session_stats",
    "events_anomaly_zscore",
    "orders_market_basket",
    "parts_abc_pareto",
    "orders_backlog_aging",
    "supplier_scorecard",
    # -- [26-28] corpus family (llm/corpus.py touched r6) --
    "dedup_incremental",
    "corpus_sample_temperature",
    "emb_quantize_int8",
    # -- [29-31] sampling family (operators/sampling.py + api touched
    # r6; sample_cap_per_group is NEW in r7) --
    "sample_stratified",
    "pack_sequences",
    "sample_cap_per_group",
    # -- [31-47] round-7-touched: df-level API extension + ADVICE fixes --
    "dq_profile",
    "dq_constraints",
    "dq_drift",
    "maintenance_compact",
    "cdc_snapshot_diff",
    "dedup_survivors",
    "dedup_clusters",
    "dedup_near_verified",
    "dedup_minhash_banded",
    "dedup_prefix",
    "dedup_exact",
    "dedup_near",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "events_funnel",
    "split_train_val_test",
    # -- [50] oldest-green rotation (last driver row: round 1;
    # filter_cmp and join_inner fell to the r8 slice when
    # sample_cap_per_group and dq_drift took their slots) --
    "topk_orders",
    # ---- 51+: stable tail (round-5 ordering; duplicates skipped) ----
    # -- [1-5] curation ops newly wired into the registry --
    "decontaminate_ngram",
    "text_repetition_filter",
    "events_pii_scrub",
    "emb_dim_reduce_rp",
    "dedup_semantic_buckets",
    # -- [6-14] operators written this round (first driver exposure) --
    "text_unigram_lm_score",
    "text_token_entropy",
    "dedup_prefix",
    "decontaminate_bloom",
    "events_bot_rate",
    "mm_audio_feature",
    "text_quality_composite",
    "mm_image_resize",
    "pipeline_curation_capstone",
    # -- rotating proven-core sentinels (round-5 set) --
    "q1_pricing_summary",
    "join_multiway",
    "agg_grouping_sets",
    "stream_session",
    "sql_q21_sole_blame",
    "dedup_near_verified",
    "split_train_val_test",
    # -- [13-28] streaming surface (harness code touched this round) --
    "source_stream_replay",
    "sink_foreach_batch",
    "stream_tumbling",
    "stream_sliding",
    "stream_watermark",
    "stream_dedup",
    "stream_stateful",
    "stream_static_join",
    "stream_stream_join",
    "stream_quarantine",
    "stream_dedup_wm",
    "stream_sink_parquet",
    "stream_join_outer",
    "stream_session_dynamic",
    "stream_upsert_merge",
    "stream_update_mode",
    # -- [29-50] oldest-green proven-core rotation --
    "sql_q3_shipping_priority",
    "sql_q6_forecast_revenue",
    "sql_q7_volume_shipping",
    "sql_q10_returned_items",
    "sql_q18_large_customers",
    "events_retention_cohort",
    "events_funnel",
    "orders_rfm",
    "win_gap_islands",
    "sketch_quantiles",
    "sketch_count_min",
    "dedup_clusters",
    "dedup_minhash_banded",
    "text_langid",
    "text_fingerprint",
    "mm_image_meta",
    "pack_sequences",
    "join_bucketed",
    "fn_struct",
    "udaf_grouped",
    "agg_minmax_by",
    "win_frame_rows",
    # -- 51+: the round-4 window (all driver-green in r4), then
    # everything else in earlier-round ordering --
    "sql_q2_min_cost_supplier",
    "sql_q9_product_profit",
    "sql_q11_important_parts",
    "sql_q12_ship_latency",
    "sql_q13_order_distribution",
    "sql_q15_top_supplier",
    "sql_q16_supplier_part_counts",
    "sql_q19_disjunctive_ranges",
    "sql_q20_promo_concentration",
    "sql_q22_dormant_value",
    "pipeline_train_export",
    "dedup_incremental",
    "corpus_sample_temperature",
    "emb_quantize_int8",
    "emb_label_margin",
    "text_canonicalize",
    "win_distribution",
    "win_running_distinct",
    "events_anomaly_zscore",
    "orders_market_basket",
    "parts_abc_pareto",
    "orders_backlog_aging",
    "supplier_scorecard",
    "agg_percentiles_exact",
    "sink_scan_orc",
    "scan_schema_evolution",
    "sink_range_partitioned",
    "scan_csv_corrupt",
    "maintenance_compact",
    "cdc_snapshot_diff",
    "dq_profile",
    "dq_constraints",
    "join_interval_chunked",
    "join_asof_tolerance",
    "sketch_hll_merge",
    "fn_datetime_arith",
    "dedup_near",
    "project",
    "join_semi",
    "agg_pivot",
    "win_topk_group",
    "dedup_exact",
    "sim_cosine_topk",
    "sample_stratified",
    "sketch_bloom",
    "sql_exists_subquery",
    "sql_scalar_subquery",
    "union_distinct",
    "intersect",
    "intersect_all",
    "except_distinct",
    "except",
    "except_all",
    "fn_array",
    "text_tokenize",
    "mm_binary",
    "fn_hash_native",
    "dedup_minhash_lsh",
    "sim_ann_lsh",
    "sim_ann_ivf",
    "sql_q8_market_share",
    "sql_q14_promo_effect",
    "agg_histogram",
    "agg_mode",
    "events_session_stats",
    "agg_rollup_incremental",
    "text_tfidf_top_terms",
    "text_bpe_token_count",
    "text_containment",
    "emb_label_centroid_dist",
    "join_asof_nearest",
    "join_dpp_partitioned",
    "join_asof",
    "win_frame_range",
    "scan_parquet_ns",
    "sessionize_batch",
    "agg_approx_distinct",
    "join_skew_salted",
    "sql_q5_local_supplier_volume",
    "fn_string",
    "fn_date",
    "fn_math",
    "fn_array_explode",
    "fn_map",
    "fn_json",
    "fn_hash",
    "fn_bitwise",
    "udf_scalar",
    "udtf_grouped_map",
    "udtf_map",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "sim_knn_query",
    "vec_norm",
    "text_token_stats",
    "text_quality",
    "text_lang_stats",
    "mm_frame_sample",
    "pipeline_corpus_preprocess",
    "pipeline_sensory_ingest",
    "nested_struct_stored",
    "nested_map_stored",
    "nested_null_stored",
)


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module (side effect: registration) and return
    the full registry, reordered so the driver's 50-query correctness
    window covers refactor-touched and oldest-verified operators first
    (see _ROUND8_PRIORITY; _ROUND7_PRIORITY is the stable tail). Keys are
    the SURVEY.md §2 operator IDs."""
    import importlib

    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    ordered: dict[str, QuerySpec] = {}
    for name in (*_ROUND8_PRIORITY, *_ROUND7_PRIORITY):
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, spec in QUERIES.items():
        if name not in ordered:
            ordered[name] = spec
    return ordered


__all__ = [
    "TABLES",
    "QUERIES",
    "QuerySpec",
    "all_queries",
    "ensure_engine_conf",
    "get_session",
    "load",
    "load_all",
]
