"""Central registry mapping SURVEY.md §2 operator names to

  * a PySpark query callable ``(spark, sf_dir) -> DataFrame``  (→ ``queries()``)
  * an equivalent DuckDB-runnable ANSI SQL string               (→ ``oracle_sql()``)

Oracle-less registrations (``oracle=None``) are the rows-only operators
(SURVEY.md §2 inventory line: approximate/randomized results — 3 as of
round 4, after llm_near_dedup_minhash and stream_watermark_late gained
exact oracles).

Canonicalization contract (SURVEY.md §5.3) — enforced by convention in every
registered pair:
  * floating aggregates rounded identically on both sides:
    round(x, 2) for money, round(x, 6) for ratios/similarities;
  * DuckDB integer aggregates cast to BIGINT to match Spark's long;
  * ``events.ts`` is µs on disk (post-2026-08-13 regen; the loader's footer
    sniff still guards the legacy ns path — see schemas.py);
  * every LIMIT/top-k ordered with a unique key suffix;
  * every computed column aliased to the same name on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: Modules that register operators on import, in SURVEY.md §2 section order.
_OPERATOR_MODULES = (
    "highspeedrailwaybigdatasystem_spark.operators.scans",
    "highspeedrailwaybigdatasystem_spark.operators.filters",
    "highspeedrailwaybigdatasystem_spark.operators.joins",
    "highspeedrailwaybigdatasystem_spark.operators.aggregates",
    "highspeedrailwaybigdatasystem_spark.operators.windows",
    "highspeedrailwaybigdatasystem_spark.operators.sorts",
    "highspeedrailwaybigdatasystem_spark.operators.setops",
    "highspeedrailwaybigdatasystem_spark.operators.scalars",
    "highspeedrailwaybigdatasystem_spark.operators.timeseries",
    "highspeedrailwaybigdatasystem_spark.operators.graph",
    "highspeedrailwaybigdatasystem_spark.operators.ml",
    "highspeedrailwaybigdatasystem_spark.operators.etl",
    "highspeedrailwaybigdatasystem_spark.operators.tpch",
    "highspeedrailwaybigdatasystem_spark.sources.formats",
    "highspeedrailwaybigdatasystem_spark.sources.custom_source",
    "highspeedrailwaybigdatasystem_spark.functions.udfs",
    "highspeedrailwaybigdatasystem_spark.functions.llm",
    "highspeedrailwaybigdatasystem_spark.streaming.streams",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle) to the surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _loaded = True
        for mod in _OPERATOR_MODULES:
            import_module(mod)


#: The external gate samples the FIRST 50 entries of ``all_queries()`` each
#: round. This tuple pins that window explicitly so coverage can rotate:
#: rounds 1–2 gated the scans/filters/joins/aggs prefix, round 3 gated the
#: 16 events.ts-repaired ops + 34 window/sort/setop/scalar ops, round 4
#: the remaining joins + advanced-agg/scalar/timeseries/graph blocks (147
#: distinct names driver-green cumulatively after r4, all 50/50 green in
#: CORRECTNESS_r04.json). Names absent from the registry are ignored.
#:
#: Round 5 executed the rotation plan recorded at the end of round 4 (tpch
#: q01–q22 + etl block + 10 sources/sinks): 50/50 green in
#: CORRECTNESS_r05.json, frozen into tools/gen_driver_coverage.py history.
#:
#: ROUND 7 (this window): the 10 never-gated ``stream_*`` ops FIRST
#: (stateful streaming is the family where the local mirror least
#: resembles the driver's environment — r6 verdict task #2), then the 19
#: ``ml_*``, 8 ``udf_*``, 3 ``udtf_*``, 7 ``mm_*`` ops and the first 3
#: ``graph_*`` ops, exactly filling the 50-slot window from the
#: never-gated oracle-backed pool (175 at round-7 start).
#: Remaining-rounds plan so the pool finishes by round 9:
#:   r8 — the 6 remaining graph_* ops, the 34 remaining llm_* ops, and
#:        the first 10 agg_* backlog ops (alphabetical).
#:   r9 — the remaining agg_*/ts_*/win_*/sql_*/etl_*/scalar/misc backlog
#:        (~75 post-r8) + any ops added in rounds 7–8; overflow to r10.
#: See DRIVER_COVERAGE.md ("Never-gated oracle-backed pool") for the
#: authoritative pool; keep rows-only names out of every window (they can
#: never hash-green).
_WINDOW_PRIORITY: tuple[str, ...] = (
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
    # first graph ops (rest rotate in r8)
    "graph_assortativity", "graph_bfs_distance",
    "graph_clustering_coefficient",
)


def all_queries() -> dict[str, QueryFn]:
    """All registered queries: the pinned gate window first (oracle-backed,
    see ``_WINDOW_PRIORITY``), then the remaining oracle-backed entries in
    registration order, then oracle-less entries last. The external gate
    samples a prefix window of this dict in insertion order — rows-only ops
    (no oracle ⇒ can never be hash-green) must not occupy gated slots."""
    _ensure_loaded()
    ordered = {
        n: _QUERIES[n] for n in _WINDOW_PRIORITY if n in _QUERIES and n in _ORACLES
    }
    ordered.update({n: f for n, f in _QUERIES.items() if n in _ORACLES})
    ordered.update({n: f for n, f in _QUERIES.items() if n not in _ORACLES})
    return ordered


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)
