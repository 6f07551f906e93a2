#!/usr/bin/env python3
"""Generate DRIVER_COVERAGE.md — the cumulative driver-gate ledger.

The external driver samples the FIRST 50 entries of ``registry.all_queries()``
each round and records per-op rows/schema/hash verdicts in
``CORRECTNESS_r{N}.json`` (overwritten every round, so only the latest file
survives on disk). This tool is the durable record: it embeds each round's
pinned gate window and its driver verdict, reconciles them against the live
registry, and emits a per-op ledger plus the authoritative never-gated pool
that future rotations draw from.

History sources (auditable from git):
  r1 window   — first 50 registration-order entries (pre-_WINDOW_PRIORITY);
                verdicts from VERDICT.md @ 8f1582e (48 green, agg_collect
                driver-canon crash, agg_approx_distinct err:no_oracle).
  r2 window   — VERDICT.md @ 692d38e (47 green; join_self_interval/join_asof/
                join_asof_nearest failed on the ns->us testdata regeneration).
  r3 window   — registry.py @ ff32347 (50/50 green per the r3 verdict).
  r4 window   — registry.py @ 0df3aec..8f96d43 (50/50 green in
                CORRECTNESS_r04.json, verified on disk).
  r5+ window  — the live ``registry._WINDOW_PRIORITY`` (verdict "pending"
                until the round's CORRECTNESS file lands).

Run: ``python tools/gen_driver_coverage.py`` (writes DRIVER_COVERAGE.md).
``tests/test_registry.py`` pins that the generated file is in sync and that
the live window contains only never-green oracle-backed ops.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from highspeedrailwaybigdatasystem_spark import registry  # noqa: E402

# ---------------------------------------------------------------------------
# Embedded gate history: round -> {op: verdict}. Verdicts: "green" (rows +
# schema + hash all matched), "fail" (mismatch), "err" (driver could not
# compare, e.g. no oracle registered at the time).
# ---------------------------------------------------------------------------

_R2_WINDOW = [
    "agg_collect", "agg_count_distinct", "agg_cube", "agg_distinct_rows",
    "agg_filter_clause", "agg_grouping_sets", "agg_having", "agg_minmax_by",
    "agg_mode_median", "agg_percentile", "agg_pivot", "agg_rollup",
    "agg_scan_group", "agg_stats", "agg_unpivot", "filt_hash_sample",
    "filt_in_list", "filt_like", "filt_null_safe", "filt_pred_and_or",
    "geo_grid_join", "join_anti", "join_asof", "join_asof_nearest",
    "join_bloom_filter", "join_broadcast", "join_cross", "join_full_outer",
    "join_left_outer", "join_multiway", "join_null_aware_anti",
    "join_range_binned", "join_self_interval", "join_semi", "join_shuffle",
    "join_skew_salted", "join_theta_range", "null_handling", "proj_case_when",
    "proj_expr_arith", "scan_agg_pushdown", "scan_full", "scan_metadata_cols",
    "scan_partition_prune", "scan_project", "sql_exists_subquery",
    "sql_group_by_all", "sql_pivot", "sql_recursive_cte",
    "sql_scalar_subquery",
]
_R2_FAILS = {"join_self_interval", "join_asof", "join_asof_nearest"}

# r1 sampled the same prefix before join_bloom_filter existed; agg_collect
# crashed driver-side canonicalization and agg_approx_distinct had no oracle.
_R1_WINDOW = [n for n in _R2_WINDOW if n != "join_bloom_filter"] + [
    "agg_approx_distinct"
]
_R1_NONGREEN = {"agg_collect": "fail", "agg_approx_distinct": "err"}

_R3_WINDOW = [
    "join_self_interval", "join_asof", "join_asof_nearest",
    "win_lag_lead", "win_first_last", "win_session_window_fn",
    "ts_sessionize", "ts_gapfill", "ts_ohlc", "ts_hourly_rollup",
    "ts_retention_cohort", "ts_interpolate_linear",
    "stream_tumbling", "stream_sliding", "stream_session",
    "stream_stream_join",
    "agg_histogram", "agg_boolean", "sql_hints", "sql_distribute_sort_by",
    "agg_bitmap_distinct", "agg_weighted_median", "agg_regression",
    "agg_listagg", "win_rownum_topk", "topk_per_group", "win_rank_dense",
    "win_running_sum", "win_moving_avg", "win_ntile_pctrank",
    "win_named_window", "win_ignore_nulls", "win_moving_median",
    "sort_multikey", "topk_global", "set_union_all", "set_union_distinct",
    "set_intersect", "set_except", "set_intersect_all", "set_except_all",
    "str_funcs", "str_split_regex", "dt_extract", "dt_arith", "math_funcs",
    "arr_basic", "arr_higher_order", "arr_explode", "json_extract",
]

_R4_WINDOW = [
    "join_asof_forward", "join_array_membership", "join_temporal_scd2",
    "agg_count_min_sketch", "agg_corr_covar", "agg_ols_multivariate",
    "agg_bitwise", "agg_gini_concentration",
    "win_time_range_frame", "win_distinct_rolling", "win_pareto_abc",
    "sql_unpivot_syntax", "sql_lateral_view", "sql_udf", "sql_tvf_range",
    "sql_parameterized", "sql_values_inline", "sql_star_except",
    "sql_lateral_join", "sql_identifier_dynamic",
    "set_union_by_name",
    "dt_format", "dt_timezone", "dt_interval_arith", "dt_business_days",
    "str_levenshtein", "str_funcs2", "str_collate", "str_mask",
    "str_regexp2",
    "json_roundtrip", "json_variant", "xml_roundtrip",
    "null_safe_math", "arr_setops", "arr_map_hof", "map_ops",
    "ts_anomaly", "ts_ewma", "ts_funnel", "ts_transition_matrix",
    "ts_seasonal_ma", "ts_week_over_week", "ts_activity_streaks",
    "ts_percentile_rollup", "ts_autocorr_lag", "ts_cusum_drift",
    "graph_pagerank", "graph_triangle_count",
    "etl_scd1_upsert",
]


_R5_WINDOW = [
    "tpch_q01", "tpch_q02", "tpch_q03", "tpch_q04", "tpch_q05",
    "tpch_q06", "tpch_q07", "tpch_q08", "tpch_q09", "tpch_q10",
    "tpch_q11", "tpch_q12", "tpch_q13", "tpch_q14", "tpch_q15",
    "tpch_q16", "tpch_q17", "tpch_q18", "tpch_q19", "tpch_q20",
    "tpch_q21", "tpch_q22",
    "etl_column_profile", "etl_compaction", "etl_data_vault_hashkeys",
    "etl_dq_audit", "etl_dynamic_overwrite", "etl_fk_orphan_audit",
    "etl_gdpr_delete_audit", "etl_late_arriving_dim", "etl_merge_cdc_apply",
    "etl_missing_partition_detect", "etl_partition_checksum_manifest",
    "etl_scd2_history", "etl_scd3_prev_value", "etl_snapshot_diff",
    "etl_time_travel_snapshots", "etl_ttl_retention_audit",
    "etl_watermark_ingest", "etl_zorder_layout",
    "src_csv_roundtrip", "src_json_lines", "src_json_corrupt",
    "src_orc_roundtrip", "src_text_lines", "src_binary_files",
    "src_custom_datasource", "src_custom_datasink",
    "sink_parquet_part", "sink_bucketed",
]


_R6_WINDOW = [
    "llm_ann_recall_eval", "llm_bigram_entropy_rate", "llm_bigram_lm",
    "llm_bm25_retrieval", "llm_chunk_overlap_dedup", "llm_collocation_pmi",
    "llm_containment_banded", "llm_containment_dedup", "llm_contamination",
    "llm_context_length_histogram", "llm_cross_snapshot_dedup",
    "llm_curation_funnel", "llm_curriculum_buckets", "llm_data_scaling_curve",
    "llm_dataset_stats_card", "llm_dedup_components", "llm_dedup_survivorship",
    "llm_doc_fingerprint", "llm_doremi_reweight_step", "llm_dsir_importance",
    "llm_dup_cluster_size_dist", "llm_embed_near_dup", "llm_embedding_quantize",
    "llm_embedding_stats", "llm_epoch_repetition_plan", "llm_exact_dedup",
    "llm_gopher_repetition", "llm_hard_negative_mining", "llm_hash_split",
    "llm_importance_resample", "llm_incremental_bloom_dedup", "llm_ivf_ann",
    "llm_kl_divergence_split", "llm_knn_all", "llm_lang_id",
    "llm_minhash_banding", "llm_mixture_temperature", "llm_mmr_diverse_topk",
    "llm_near_dedup_minhash", "llm_ngram_jaccard", "llm_ngram_novelty",
    "llm_oversample_minority", "llm_perplexity_buckets", "llm_perplexity_proxy",
    "sink_compression_codecs", "src_csv_quoted_multiline",
    "src_custom_stream_source", "src_glob_recursive", "src_schema_evolution",
    "stream_file_source",
]


_R7_WINDOW = [
    # stateful streaming block — zero driver exposure before round 7
    "stream_cdc_latest_upsert", "stream_custom_state", "stream_dedup",
    "stream_dedup_ttl", "stream_foreachbatch", "stream_full_outer_join",
    "stream_left_outer_join", "stream_static_join",
    "stream_topk_per_window", "stream_watermark_late",
    # ml block
    "ml_binary_metrics", "ml_boosted_stumps_2round", "ml_calibration_ece",
    "ml_confusion_matrix_multiclass", "ml_dbscan_1d", "ml_decision_stump",
    "ml_feature_scaling", "ml_fuzzy_cmeans_step", "ml_kfold_assignment",
    "ml_kmeans_lloyd", "ml_knn_classifier_eval", "ml_logistic_gd_steps",
    "ml_mcnemar_paired_test", "ml_naive_bayes_langid", "ml_ndcg_at_k",
    "ml_pca_power_iteration", "ml_pr_auc_trapezoid", "ml_roc_auc",
    "ml_silhouette_simplified",
    # python-boundary block (udf/udtf)
    "udf_arrow_optimized", "udf_cogrouped_apply", "udf_map_in_arrow",
    "udf_map_in_pandas", "udf_pandas_grouped_agg", "udf_pandas_iterator",
    "udf_pandas_scalar", "udf_python_scalar",
    "udtf_analyze_polymorphic", "udtf_apply_in_pandas", "udtf_python",
    # multimodal block
    "mm_audio_chunk_stub", "mm_decode_stub", "mm_embed_sim_stub",
    "mm_frame_sample", "mm_image_resize_stub", "mm_modality_router",
    "mm_video_scene_cut_stub",
    # first graph ops
    "graph_assortativity", "graph_bfs_distance",
    "graph_clustering_coefficient",
]


def history() -> dict[int, dict[str, str]]:
    h: dict[int, dict[str, str]] = {}
    h[1] = {n: _R1_NONGREEN.get(n, "green") for n in _R1_WINDOW}
    h[2] = {n: ("fail" if n in _R2_FAILS else "green") for n in _R2_WINDOW}
    h[3] = {n: "green" for n in _R3_WINDOW}
    h[4] = {n: "green" for n in _R4_WINDOW}
    # r5: 50/50 green in CORRECTNESS_r05.json (verified on disk at round-6
    # start; frozen here because the driver overwrites the file each round).
    h[5] = {n: "green" for n in _R5_WINDOW}
    # r6: 50/50 green in CORRECTNESS_r06.json (verified on disk at round-7
    # start; the window was the 6 left-over source ops + 44 llm_* ops).
    h[6] = {n: "green" for n in _R6_WINDOW}
    # r7: 50/50 green in CORRECTNESS_r07.json (stream/ml/udf/udtf/mm + first
    # 3 graph ops). r8 shipped zero commits, so the driver re-gated the
    # IDENTICAL window — CORRECTNESS_r08.json is 50/50 green on the same
    # name set (verified on disk at round-9 start; the r8 verdict confirms
    # the name sets match programmatically).
    h[7] = {n: "green" for n in _R7_WINDOW}
    h[8] = {n: "green" for n in _R7_WINDOW}
    return h


def _disk_verdicts(path: Path) -> dict[str, str]:
    rec = json.loads(path.read_text())
    out: dict[str, str] = {}
    for op, v in rec.items():
        ok = (
            isinstance(v, dict) and v.get("rows_match")
            and v.get("schema_match") and v.get("hash_match")
        )
        out[op] = "green" if ok else "fail"
    return out


def latest_disk_round() -> tuple[int, Path] | None:
    """Newest CORRECTNESS_r{N}.json on disk, or None."""
    rounds = {
        int(p.stem.split("_r")[1]): p
        for p in REPO.glob("CORRECTNESS_r*.json")
    }
    if not rounds:
        return None
    n = max(rounds)
    return n, rounds[n]


def current_round() -> int:
    """The round whose gate window is live.

    While the builder works, the latest on-disk CORRECTNESS file belongs to a
    round already frozen in ``history()`` and the live round is max+1
    (pending). Once the driver gates the live window it writes
    CORRECTNESS_r{max_embedded+1}.json — from then until the next rotation,
    THAT file is the live round and its verdicts are folded in (this is the
    fix for the r5 accounting bug where max(disk)+1 could never see its own
    file and real verdicts were dropped as "pending").
    """
    embedded_max = max(history())
    disk = latest_disk_round()
    if disk is not None and disk[0] > embedded_max:
        return disk[0]
    return embedded_max + 1


def build(fold_live: bool = True, live_round: int | None = None) -> str:
    """Render the ledger.

    ``fold_live=True`` (default) folds the live round's on-disk CORRECTNESS
    file, if any, into its verdict column; ``fold_live=False`` renders the
    live round as "pending" regardless. The committed DRIVER_COVERAGE.md is
    necessarily the ``pending`` variant (the driver's artifact lands AFTER
    the round's last commit), so tests/test_registry.py accepts either
    rendering — that is what stops the red-at-round-start churn flagged by
    the r5 and r6 verdicts.

    ``live_round`` pins the rendered live round instead of deriving it from
    ``current_round()``. Round 8 exposed why this matters: a ZERO-COMMIT
    round lets the driver land an artifact for round max(history)+2 while
    the committed ledger was rendered at max(history)+1, shifting
    ``current_round()`` under the committed text and reddening the in-sync
    test with no code change anywhere. tests/test_registry.py therefore
    also accepts the ``live_round=max(history())+1`` renderings, so any
    number of consecutive idle rounds can never redden the suite.
    """
    h = history()
    if live_round is None:
        live_round = current_round()
    live_window = [
        n for n in registry._WINDOW_PRIORITY
        if n in registry.all_queries() and n in registry.all_oracles()
    ][:50]

    # If the driver has already recorded the live round (post-gate rerun),
    # fold its verdicts in instead of "pending".
    live_file = REPO / f"CORRECTNESS_r{live_round:02d}.json"
    live_verdicts: dict[str, str] = {}
    if fold_live and live_file.exists():
        live_verdicts = _disk_verdicts(live_file)
    h[live_round] = {
        n: live_verdicts.get(n, "pending") for n in live_window
    }

    qs = registry.all_queries()
    ors = registry.all_oracles()
    first_green: dict[str, int] = {}
    gated_rounds: dict[str, list[str]] = {}
    for rnd in sorted(h):
        for op, verdict in h[rnd].items():
            gated_rounds.setdefault(op, []).append(f"r{rnd}:{verdict}")
            if verdict == "green" and op not in first_green:
                first_green[op] = rnd

    oracle_backed = [n for n in qs if n in ors]
    rows_only = [n for n in qs if n not in ors]
    ever_green = sorted(first_green)
    pool = sorted(n for n in oracle_backed if n not in gated_rounds)

    lines = [
        "# DRIVER_COVERAGE — cumulative driver-gate ledger",
        "",
        "Auto-generated by `tools/gen_driver_coverage.py`; do not edit by",
        "hand. The driver gates the first 50 `registry.all_queries()` entries",
        "per round (CORRECTNESS_r{N}.json, overwritten each round); this file",
        "is the durable cross-round record and the source of truth for the",
        "rotation plan in `registry.py:_WINDOW_PRIORITY`.",
        "",
        f"- registered ops: **{len(qs)}** "
        f"({len(oracle_backed)} oracle-backed, {len(rows_only)} rows-only)",
        f"- driver-green at least once (r1–r{max(h)}): **{len(ever_green)}**",
        f"- gated this round (r{live_round}, pending unless the round's "
        f"CORRECTNESS file is on disk): {sum(1 for v in h[live_round].values() if v == 'pending')}",
        f"- never driver-gated oracle-backed pool: **{len(pool)}**",
        f"- rows-only (excluded from gate windows by design): "
        f"{', '.join(f'`{n}`' for n in sorted(rows_only))}",
        "",
        "## Per-op ledger (every op ever gated)",
        "",
        "| op | gate history | first green |",
        "|---|---|---|",
    ]
    for op in sorted(gated_rounds):
        hist = ", ".join(gated_rounds[op])
        fg = f"r{first_green[op]}" if op in first_green else "—"
        lines.append(f"| `{op}` | {hist} | {fg} |")

    lines += [
        "",
        f"## Never-gated oracle-backed pool ({len(pool)}) — rounds "
        f"{max(h) + 1}+ draw from here",
        "",
    ]
    for i in range(0, len(pool), 4):
        lines.append(", ".join(f"`{n}`" for n in pool[i:i + 4]))

    # Planned window sequence — GENERATED name lists (r8-verdict task #9:
    # plans must come from the regenerated ledger, not be hand-written).
    # Deterministic draw order: the never-gated pool sorted by name,
    # chunked into 50-op windows starting at the round after the live one.
    # max(h) is the LIVE round (its window is already pinned in
    # registry._WINDOW_PRIORITY); the first plannable window follows it.
    lines += [
        "",
        "## Next windows (GENERATED from the live pool — copy each list",
        "## verbatim into `registry._WINDOW_PRIORITY` at that round's start)",
        "",
    ]
    for i in range(0, len(pool), 50):
        rnd = max(h) + 1 + i // 50
        chunk = pool[i:i + 50]
        lines.append(f"### r{rnd} planned window ({len(chunk)} ops)")
        lines.append("")
        for j in range(0, len(chunk), 4):
            lines.append(", ".join(f"`{n}`" for n in chunk[j:j + 4]))
        lines.append("")
    if not pool:
        lines += ["(pool drained — every oracle-backed op has been gated)", ""]
    return "\n".join(lines)


if __name__ == "__main__":
    out = REPO / "DRIVER_COVERAGE.md"
    out.write_text(build())
    print(f"wrote {out}")
