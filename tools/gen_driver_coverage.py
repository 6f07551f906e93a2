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
  r11 verdicts — the driver's CORRECTNESS_r11.json was never left on disk
                (unlike r1–r10); frozen from the judge's verbatim quote in
                VERDICT.md @ afa2ff0 ("50/50 green ... all rows_match/
                schema_match/hash_match true, zero err") via
                ``rotate_window.py --freeze-window-green 11``.

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
# Frozen gate history lives in tools/gate_history.json: round -> {op:
# verdict}. Verdicts: "green" (rows + schema + hash all matched, proven by
# an on-disk CORRECTNESS artifact), "green-attested" (all-green per a
# verbatim judge quote in VERDICT.md, but the artifact itself was consumed
# by the driver — round 11 is the only such round; weaker provenance, so
# plan_window re-proves attested greens before artifact greens of the same
# round), "fail" (mismatch), "err" (driver could not compare, e.g. no
# oracle registered at the time). Append via tools/rotate_window.py, never
# by hand.
# ---------------------------------------------------------------------------

_HISTORY_JSON = Path(__file__).resolve().parent / "gate_history.json"

# ---------------------------------------------------------------------------
# Re-proof ledger: op -> round in which its implementation (or oracle) was
# REWRITTEN after its last driver green. A green that predates the rewrite
# proves the old code, not the shipped code, so these ops jump the re-proof
# queue until the driver re-gates them. An entry retires automatically once
# the op has a green at or after the listed round (see ``plan_window``) —
# keep stale entries here for the audit trail; they cost nothing.
# ---------------------------------------------------------------------------

_REPROOF_PAIRS: list[tuple[str, int]] = [
    # round-11 scale rewrites (quadratic-tier fixes; r10 verdict weak list).
    # NOTE: an op rewritten AGAIN in a later round appears once, at its
    # LATEST rewrite round — the ledger tracks "newest code never driver-
    # gated", and only the most recent rewrite matters for that.
    # (llm_data_scaling_curve and ml_naive_bayes_langid were r11 rewrites
    # re-rewritten in r13; they are listed under 13 below.)
    ("llm_minhash_banding", 11),
    ("llm_near_dedup_minhash", 11),
    ("llm_knn_all", 11),
    ("llm_sim_blocked", 11),
    ("llm_ann_recall_eval", 11),
    ("llm_dedup_components", 11),
    ("llm_sim_pairs_label", 11),
    ("stream_session", 11),
    ("geo_grid_join", 11),
    ("llm_containment_dedup", 11),
    ("llm_embed_near_dup", 11),
    # round-12 sweep find: rewritten to (flag, value) sufficient statistics
    # after the 100x window-buffer heap OOM; its r4 green proves the old
    # per-row-window code
    ("agg_weighted_median", 12),
    # round-13 slow-tier rewrites (r12 verdict tasks #3/#4): exact-collapse-
    # first on the train/chunk side (scaling curve, NB language-ID, CDC
    # chunking, curation funnel) and per-arm staged shingle caches (shingle
    # sensitivity). Oracles unchanged; plans rewritten.
    ("llm_data_scaling_curve", 13),
    ("ml_naive_bayes_langid", 13),
    ("llm_cdc_chunking", 13),
    ("llm_curation_funnel", 13),
    ("llm_shingle_size_sensitivity", 13),
    # round-13 sweep finds: theta-range probe sliver bounded by a fixed key
    # cap (was quadratic in SF); DSIR collapsed to distinct-content grain
    # (was a full-corpus token explode + broadcast OOM under sweep memory
    # pressure). join_theta_range sits IN the r13 window, so its r13 gate
    # already proves the new code; the entry records the rewrite for audit.
    ("join_theta_range", 13),
    ("llm_dsir_importance", 13),
    # round-13 wave 2 (isolated-cache sweep cold-cost tier): the remaining
    # full-corpus text explodes collapsed to distinct-content grain, and
    # the binned range join moved to (type, value)-multiplicity counting.
    ("join_range_binned", 13),
    ("llm_repetition_loop_detect", 13),
    ("llm_perplexity_filter", 13),
    ("llm_template_boilerplate_detect", 13),
    ("llm_ngram_novelty", 13),
    # round-14 round-START rewrites, all landed BEFORE the r14 rotation
    # pinned the window, so eligible for the r14 gate itself (see
    # plan_window's ``<= for_round`` rule):
    # - join_range_binned: NULL-value and zero-pair-group edge guards
    #   matching the brute-force oracle's inner-join semantics (r13 ADVICE)
    # - geo_grid_join: ANTIMERIDIAN cell wrap (pmod on the lon cell index)
    #   — found by the new geo_grid_topk's sf0.1 mirror; the r13 green ran
    #   at sf0.01 where no cross-seam pair exists, so the fixed code has
    #   never been driver-gated on a corpus that exercises the seam.
    ("join_range_binned", 14),
    ("geo_grid_join", 14),
    # round-14 sf0.1 full-mirror finds (the first full-surface drive at
    # sf0.1; both are §5.3 round()-after-division hazards that sf0.01
    # data never materialized): tpch_q11 moved to exact integer
    # ten-thousandths revenue sums (a double sum's last ulp split a cent
    # at 220444.875); ts_value_at_risk quantizes expected-shortfall cents
    # as floor((2s+c)/2c) over exact integers (tail mean landed exactly
    # on a half-cent). Landed before the r14 pin → r14-gate eligible.
    ("tpch_q11", 14),
    ("ts_value_at_risk", 14),
    # round-14 1000×-probe find: the uncollapsed chunk self-join spilled
    # >58 GB of shuffle at sf100 (pairs grow copies² under duplicate
    # amplification) — moved to distinct-content representatives (reps
    # CTE both sides), 38→7 s at 100×, 12.9 s at 1000×. Landed before the
    # r14 pin → r14-gate eligible.
    ("llm_chunk_overlap_dedup", 14),
    # round-14 TPC-H 1000×-probe find: tpch_q02 force-broadcast its
    # per-part best-cost aggregate — |parts|-scaled, 20 M rows at sf100
    # (cluster-fatal); unhinted so AQE picks broadcast at small tiers and
    # SMJ at scale (34% faster at BOTH probe tiers). Oracle unchanged;
    # landed before the r14 pin → r14-gate eligible.
    ("tpch_q02", 14),
    # round-15 r14-verdict-task rewrites (each mirror-verified at
    # sf0.01 AND sf0.1 when landed; promoted into the r15 window by the
    # stamped re-pin — see rotate_window --repin):
    # - geo_grid_topk: coverage bound derived from the synthesis band
    #   (was hardcoded 109.0 km/deg) + forced-tier conf override; the
    #   fine/escalation path is now bit-equality-proven vs single-pass
    #   and numpy brute force (tests/test_geo_forced_tier.py).
    # - tpch_q11: revenue ten-thousandths now sum into DECIMAL(38,0)
    #   (int64 overflowed around sf~5000 where DuckDB promotes to
    #   HUGEINT — r14 ADVICE).
    ("geo_grid_topk", 15),
    ("tpch_q11", 15),
    # round-15 broadcast_lint first-measurement finds (BROADCASTS.md):
    # - join_broadcast: the exhibit broadcast the WHOLE corpus-scaled
    #   part table (measured fraction 1.0 vs declared 1/250 — the r14
    #   tpch_q02 class); now pre-filtered to p_size = 1 (~2%) with a
    #   machine-checked 0.05 fraction bound.
    # - etl_late_arriving_dim: NOT IN over nullable parquet keys planned
    #   as a REQUIRED BNLJ broadcast of the |dim| keyset (148->1484
    #   across one 10x step); moved to NOT EXISTS -> plain left-anti
    #   hash join, shuffled at any scale.
    ("join_broadcast", 15),
    ("etl_late_arriving_dim", 15),
    # round-15 null-injection wave 1 fixes (41 ops; each fix verified on
    # BOTH _scratch/nullinj and the pristine mirrors — see BASELINE.md
    # round-15 null tier section for the class taxonomy):
    ("udf_python_scalar", 15),
    ("udaf_custom", 15),
    ("udtf_python", 15),
    ("udtf_analyze_polymorphic", 15),
    ("udf_cogrouped_apply", 15),
    ("mm_decode_stub", 15),
    ("mm_frame_sample", 15),
    ("mm_audio_chunk_stub", 15),
    ("mm_audio_vad_stub", 15),
    ("mm_patch_embed_stub", 15),
    ("mm_embed_sim_stub", 15),
    ("mm_modality_router", 15),
    ("src_binary_files", 15),
    ("llm_sim_blocked", 15),
    ("llm_sim_pairs_label", 15),
    ("llm_embed_near_dup", 15),
    ("llm_dedup_components", 15),
    ("llm_ann_recall_eval", 15),
    ("llm_mmr_diverse_topk", 15),
    ("llm_ann_lsh", 15),
    ("llm_embedding_pq_codebook", 15),
    ("ml_kmeans_lloyd", 15),
    ("graph_pagerank", 15),
    ("graph_triangle_count", 15),
    ("graph_degree_stats", 15),
    ("graph_bfs_distance", 15),
    ("graph_common_neighbors", 15),
    ("graph_k_core", 15),
    ("graph_assortativity", 15),
    ("graph_clustering_coefficient", 15),
    ("graph_jaccard_link_prediction", 15),
    ("graph_label_propagation", 15),
    ("graph_connected_components", 15),
    ("graph_reciprocity", 15),
    ("graph_two_hop_reach", 15),
    ("graph_bipartite_projection", 15),
    ("ml_dbscan_1d", 15),
    ("ml_gini_auc_identity", 15),
    ("sql_order_by_all", 15),
    ("win_ntile_pctrank", 15),
    ("win_exponential_decay_score", 15),
    ("str_regexp2", 15),
    ("arr_setops", 15),
    ("llm_window_chunking", 15),
    ("llm_cdc_chunking", 15),
    ("llm_incremental_bloom_dedup", 15),
    ("llm_data_scaling_curve", 15),
    ("llm_curation_funnel", 15),
    ("src_text_lines", 15),
    ("src_csv_permissive_corrupt", 15),
    # round-15 null-injection wave 2 fixes (NULL measures/dates/FK keys;
    # 14 ops) + the geo shared-constant rewrite (geo_grid_join's synthesis
    # now derives from the shared band constants) + tpch_q09's exact
    # integer profit sums (signed q11 pattern):
    ("agg_ks_test_two_sample", 15),
    ("agg_mann_whitney_u", 15),
    ("agg_spearman_rho", 15),
    ("agg_weighted_median", 15),
    ("ml_roc_auc", 15),
    ("etl_scd2_history", 15),
    ("scalar_try_funcs", 15),
    ("ts_downsample_m4", 15),
    ("ts_seasonal_ma", 15),
    ("udf_map_in_arrow", 15),
    ("win_running_sum", 15),
    ("win_named_window", 15),
    ("win_ignore_nulls", 15),
    ("tpch_q09", 15),
    ("geo_grid_join", 15),
    # round-16 null-injection WAVE 3 (streaming axis — _scratch/
    # nullinj_stream: NULL event time + NULL routing key). Five
    # divergences, two classes:
    # - NULL event time through window()/session_window/date_trunc
    #   ranking: Spark's window operators drop it, batch SQL keeps it as
    #   a NULL-window group; now dropped EXPLICITLY at ingest with the
    #   filter shared verbatim by the oracle (tumbling, sliding, session,
    #   topk_per_window);
    # - NULL routing key through a driver-side accumulator: bare
    #   sorted() raised TypeError on the None/str key mix
    #   (foreachbatch) — NULL stays a legitimate merge-key group.
    ("stream_tumbling", 16),
    ("stream_sliding", 16),
    ("stream_session", 16),
    ("stream_topk_per_window", 16),
    ("stream_foreachbatch", 16),
    # round-17 optimization rewrites (OPTIMIZATION_r17.md) — results
    # mirror-proven identical at 3 SFs (+ nullinj where NULL semantics
    # were touched), registered here so the driver's own gate re-proves
    # the new code paths:
    # - IVF-family assignment + recall-eval arms moved to mapInArrow
    #   GEMM-prefilter/exact-fold kernels;
    # - minhash banding restructured to doc-grain shingle arrays (its two
    #   composers inherit the new plan);
    # - blocked-GEMM block count from a scan-max upper bound (all GEMM
    #   callers);
    # - market-basket consumers folded into one pass;
    # - triangle-count r16 checkpoints reverted on measurement;
    # - connected-components / label-propagation fail-loud caps;
    # - boosted-stumps COALESCE edge-semantics restore.
    ("llm_minhash_banding", 17),
    ("llm_lsh_tuning_curve", 17),
    ("llm_dup_partner_degree_dist", 17),
    ("llm_ann_recall_eval", 17),
    ("llm_ivf_ann", 17),
    ("llm_ivf_index_persist", 17),
    ("llm_semdedup_centroid", 17),
    ("llm_knn_all", 17),
    ("ml_knn_classifier_eval", 17),
    ("llm_embed_near_dup", 17),
    ("llm_sim_pairs_label", 17),
    ("llm_sim_blocked", 17),
    ("llm_dedup_components", 17),
    ("agg_market_basket_lift", 17),
    ("graph_triangle_count", 17),
    ("graph_connected_components", 17),
    ("ml_boosted_stumps_2round", 17),
]

# Built from pairs with an explicit uniqueness check: a duplicate literal
# key in a dict display is silently last-wins (r13 verdict "what's wrong"
# #3 — two r11 entries were shadowed by their r13 re-rewrites with no
# signal). Listing an op twice is now a hard import error EXCEPT the one
# legitimate shape: strictly increasing rounds (re-rewritten later), where
# the latest round wins loudly rather than silently.
REPROOF_REWRITTEN: dict[str, int] = {}
for _op, _rnd in _REPROOF_PAIRS:
    if _op in REPROOF_REWRITTEN and _rnd <= REPROOF_REWRITTEN[_op]:
        raise AssertionError(
            f"REPROOF_REWRITTEN duplicate for {_op!r}: round {_rnd} does "
            f"not supersede recorded round {REPROOF_REWRITTEN[_op]} — "
            "remove the stale pair."
        )
    REPROOF_REWRITTEN[_op] = _rnd
del _op, _rnd


#: Verdict values that count as a green gate. "green-attested" is a green
#: whose artifact was never on disk (judge-quoted); it counts for coverage
#: but carries weaker provenance — see ``latest_green_attested``.
GREEN_VERDICTS = frozenset({"green", "green-attested"})


def last_green(hist: dict[int, dict[str, str]]) -> dict[str, int]:
    """op -> most recent round with a driver green (either provenance)."""
    out: dict[str, int] = {}
    for rnd in sorted(hist):
        for op, verdict in hist[rnd].items():
            if verdict in GREEN_VERDICTS:
                out[op] = rnd
    return out


def latest_green_attested(hist: dict[int, dict[str, str]]) -> set[str]:
    """Ops whose MOST RECENT green is attested-only (no artifact backs it).
    The re-proof rotation orders these before artifact-backed greens of the
    same round, so judge-quoted evidence is replaced by artifact evidence
    at the earliest opportunity."""
    kind: dict[str, str] = {}
    for rnd in sorted(hist):
        for op, verdict in hist[rnd].items():
            if verdict in GREEN_VERDICTS:
                kind[op] = verdict
    return {op for op, v in kind.items() if v == "green-attested"}


def plan_window(
    hist: dict[int, dict[str, str]],
    size: int = 50,
    for_round: int | None = None,
) -> list[str]:
    """The next gate window, given a frozen history — THE rotation policy.

    ``for_round`` (default ``max(hist) + 1``): the round this window will
    gate in. A ``REPROOF_REWRITTEN`` entry with value N is eligible for
    round N's OWN window (``<= for_round``): the driver gates the code as
    it stands at round END, so a rewrite proven during round N belongs in
    round N's gate. The actual invariant (r14 ADVICE — the old wording
    claimed "a rotation only runs once per round", but r14 re-pinned the
    live tuple four times mid-round): the FREEZE runs exactly once per
    round (rotate_window refuses to freeze without a new CORRECTNESS
    artifact), while the tuple may be RE-PINNED mid-round to promote ops
    rewritten after the round-start pin — each re-pin must go through
    ``rotate_window --repin``, which recomputes this policy, increments
    the pin sequence recorded in the stamped comment inside the WINDOW
    block, and requires the operator to state that fresh mirror evidence
    accompanies the promotion. Hand edits without a restamp fail
    ``tests/test_registry.py`` (the stamp hashes the tuple), so every
    mid-round re-pin is mechanically visible to the next audit.

    Slots are spent in strict priority order (steady-state policy, r11
    verdict task #3 — the generator keeps emitting windows forever instead
    of freezing once the never-gated pool drains):

      1. never-gated oracle-backed ops (sorted by name) — drain the pool;
      2. gated-but-never-green ops (a fail/err must be re-proven first);
      3. ops whose LATEST green is attested-only (judge-quoted, no on-disk
         artifact ever — the r11 freeze) — an artifact has never touched
         these, which is a strictly weaker provenance than ANY artifact
         green, old or new, so they outrank the rewrite requeue (r15
         verdict task #1: the 44-op cohort sat behind older artifact
         greens for two rounds under the old within-round tie-break);
      4. ``REPROOF_REWRITTEN`` ops whose last green predates their rewrite
         round (rewrite order: rewrite round desc, then name);
      5. re-proof rotation over driver greens, oldest last-green first
         (then by name) — so every op's evidence keeps refreshing.

    Rows-only ops (no oracle) are excluded throughout: they can never gate
    green and would waste a slot every round.
    """
    qs, ors = registry.all_queries(), registry.all_oracles()
    oracle_backed = [n for n in qs if n in ors]
    gated = {op for verdicts in hist.values() for op in verdicts}
    lg = last_green(hist)
    if for_round is None:
        for_round = max(hist) + 1

    window: list[str] = sorted(n for n in oracle_backed if n not in gated)
    window += sorted(
        n for n in oracle_backed if n in gated and n not in lg
    )
    attested = latest_green_attested(hist)
    window += sorted(n for n in oracle_backed if n in attested)
    window += sorted(
        (n for n in oracle_backed
         if n in lg and n not in set(window)
         and lg[n] < REPROOF_REWRITTEN.get(n, 0) <= for_round),
        key=lambda n: (-REPROOF_REWRITTEN[n], n),
    )
    rest = sorted(
        (n for n in oracle_backed if n in lg and n not in set(window)),
        key=lambda n: (lg[n], n),
    )
    window += rest
    return window[:size]


def history() -> dict[int, dict[str, str]]:
    """Frozen per-round gate history: round -> {op: verdict}.

    Stored in tools/gate_history.json (single source of truth since round
    9; rounds 1-8 were migrated verbatim from the lists previously
    embedded here - provenance per round is documented in the module
    docstring above). tools/rotate_window.py appends the finished round's
    on-disk CORRECTNESS verdicts here and rotates
    registry._WINDOW_PRIORITY onto the next 50 never-gated names, so a
    rotation can never again be skipped or hand-drifted (round 8 burned
    its entire gate budget re-proving round 7's window because the manual
    rotation never happened).
    """
    raw = json.loads(_HISTORY_JSON.read_text())
    return {int(k): v for k, v in raw.items()}


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
            if verdict in GREEN_VERDICTS and op not in first_green:
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
        + (", ".join(f"`{n}`" for n in sorted(rows_only))
           or "none (all ops oracle-backed since r13)"),
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
    # ``plan_window`` is the single policy: drain the never-gated pool
    # first, then requeue fails, then rewritten-since-green ops, then
    # re-proof driver greens oldest-first — so the generator emits a
    # meaningful window FOREVER (steady-state re-verification), instead of
    # freezing once the pool drains (r11 verdict task #3). Simulation folds
    # each planned window in as green; a real fail simply requeues at the
    # next rotation via priority 2.
    lines += [
        "",
        "## Next windows (GENERATED via plan_window() — copy each list",
        "## verbatim into `registry._WINDOW_PRIORITY` at that round's start)",
        "",
    ]
    sim = {rnd: dict(v) for rnd, v in h.items()}
    sim[live_round] = {n: "green" for n in live_window}
    for rnd in range(live_round + 1, live_round + 3):
        chunk = plan_window(sim, for_round=rnd)
        n_new = sum(1 for n in chunk if n in pool)
        lines.append(
            f"### r{rnd} planned window ({len(chunk)} ops; "
            f"{n_new} never-gated, {len(chunk) - n_new} re-proof)"
        )
        lines.append("")
        for j in range(0, len(chunk), 4):
            lines.append(", ".join(f"`{n}`" for n in chunk[j:j + 4]))
        lines.append("")
        sim[rnd] = {n: "green" for n in chunk}
    if not pool:
        lines += [
            "(pool drained — every oracle-backed op has been driver-gated; "
            "windows above are steady-state re-proof rotations)",
            "",
        ]
    return "\n".join(lines)


if __name__ == "__main__":
    out = REPO / "DRIVER_COVERAGE.md"
    out.write_text(build())
    print(f"wrote {out}")
