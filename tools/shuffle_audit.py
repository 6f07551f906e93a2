"""Regenerate SHUFFLES.md — a per-operator physical-plan accounting table.

For every registered batch operator, build the plan at the oracle tier and
count the scale-relevant node types:

* ``Exchange hashpartitioning/rangepartitioning`` — real shuffles (the
  100 TB cost centers)
* ``BroadcastExchange`` — dimension/cutpoint broadcasts (cheap by design)
* Python boundary nodes (``BatchEvalPython`` / ``ArrowEvalPython`` /
  ``FlatMapGroupsInPandas`` / ``MapInPandas``) — rows that intentionally
  cross into Arrow-batched Python
* ``CartesianProduct`` — must stay zero everywhere

Usage: ``python tools/shuffle_audit.py``  (≈2 min on local[32])
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from highspeedrailwaybigdatasystem_spark.registry import all_queries
from highspeedrailwaybigdatasystem_spark.session import build_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SHUFFLE = re.compile(r"Exchange (?:hash|range)partitioning")
_BCAST = re.compile(r"BroadcastExchange")
_PY = re.compile(r"BatchEvalPython|ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas")


_GLYPHS = re.compile(r"^[\s:+|-]*")


def _dedup_cached_blocks(plan: str) -> str:
    """Collapse repeated InMemoryRelation subtrees to a single occurrence.

    ``executedPlan().toString()`` re-prints a cached stage's ENTIRE child
    plan under every InMemoryTableScan that references it, so an op that
    stages a table once but reads it 5 times would count the staging
    shuffles 5×. The cached stage executes once; keep the first printed
    copy, drop the repeats (distinct cached plans each still count once).
    Recursive since round 11: a cached view whose BUILD reads another
    cached view embeds that inner build in its own printed block, so the
    inner copies never matched a standalone occurrence and chained caches
    (shingle → idf → wsum) re-counted the shingle build once per printed
    context — 112 'shuffles' for llm_idf_weighted_jaccard's 12 real ones."""

    def _key(lines: list[str]) -> str:
        # ignores per-reference expression ids (#123) and tree glyphs
        return re.sub(r"#\d+", "#", "\n".join(ln.lstrip(" :+|-") for ln in lines))

    def _walk(lines: list[str], seen: set[str]) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(lines):
            line = lines[i]
            if "InMemoryRelation" in line:
                depth = len(_GLYPHS.match(line).group(0))
                j = i + 1
                while j < len(lines) and len(_GLYPHS.match(lines[j]).group(0)) > depth:
                    j += 1
                block = _key(lines[i:j])
                if block in seen:
                    i = j
                    continue
                seen.add(block)
                out.append(line)
                out.extend(_walk(lines[i + 1 : j], seen))
                i = j
            else:
                out.append(line)
                i += 1
        return out

    return "\n".join(_walk(plan.splitlines(), set()))


# Bounded-grain justifications for every op at >=10 deduped exchanges
# (r6 verdict task #4: each such row must either drop or carry one).
# Counts are distinct EXECUTED stages — cached-stage builds count once;
# none of these re-runs a corpus-sized stage per reference.
_NOTES = {
    "llm_curation_funnel": "r13 collapse: text attrs on one rep per "
    "(text,source) group; exchanges are rep-grain stagelets (5.4 s flat "
    "at 100x), only the md5(text) group-by is corpus-sized",
    "llm_data_scaling_curve": "r13 collapse: rep tokenize + (group,cut) "
    "multiplicity join; exchanges are group/vocab-grain model aggs "
    "(5.3 s at 100x), corpus touched once",
    "llm_semdedup_sqrtn": "cached collapse + assignment stages; exchanges "
    "are the distinct cluster-grain aggs and LSH-bounded verify joins",
    "llm_containment_banded": "cached shingle stage; exchanges are the "
    "band/candidate/verify stagelets, each LSH-bounded",
    "llm_idf_weighted_jaccard": "cached shingle/idf/wsum stages (r7 "
    "re-plan, was 14 with recompute); pair stage is source-blocked",
    "ml_naive_bayes_langid": "cached token stage; exchanges are the "
    "model-building aggs (lang x vocab grain) + one doc-grain scoring agg",
    "agg_market_basket_lift": "cached (order x brand) basket (r7 re-plan); "
    "pair step bounded at <=7 items/order",
    "ts_hurst_rs": "cached day rollup (r7 re-plan, was 13 events scans); "
    "all downstream stages run on <=31 cached rows",
    "llm_minhash_jaccard_estimate": "cached shingle/signature/candidate "
    "stages (r7 re-plan); verify joins are LSH-candidate-bounded",
    "graph_two_hop_reach": "cached adjacency view; count includes the "
    "cached build's printed repeats — live stages are the degree/2-hop/"
    "exclusion aggs on the vertex grain",
    "llm_dup_partner_degree_dist": "composes the cached banding pipeline; "
    "degree stage is one union + histogram agg on the pair set",
    "llm_shingle_size_sensitivity": "three independent shingle-size "
    "pipelines over the collapsed reps (7 exchanges each by design)",
    "llm_tfidf_cosine_pairs": "cached tf/weight stages; exchanges are the "
    "norm/pair/idf stagelets, pair join source-blocked",
    "str_trigram_similarity": "collapsed-rep trigram join; exchanges are "
    "the sizes/shared/rank stagelets on the bounded rep set",
    "llm_perplexity_filter": "cached bigram + doc-entropy stages (r7 "
    "re-plan, was 8 documents scans); scoring join is the one real shuffle",
}


_PY_EXECS = {
    "BatchEvalPythonExec",
    "ArrowEvalPythonExec",
    "FlatMapGroupsInPandasExec",
    "MapInPandasExec",
    "FlatMapCoGroupsInPandasExec",
}


def _count_plan_tree(spark, df) -> tuple[int, int, int, bool]:
    """(shuffles, broadcasts, python-boundaries, cartesian) of an op's plan,
    counted by walking the JVM SparkPlan TREE instead of its toString.

    Round-11 rewrite: once a cached stage has EXECUTED, toString prints it
    as AQE '== Final Plan ==' sections at arbitrary indentation, so the
    old text parser (indent-scoped InMemoryRelation block dedup) re-counted
    chained cached builds once per printed context — llm_idf_weighted_
    jaccard showed 112 'shuffles' for 12 real ones. The tree walk is exact:
    AQE wrappers recurse via initialPlan() (the static post-EnsureRequirements
    shape — exchanges present, no execution triggered; inputPlan() would
    predate exchange insertion), query stages via plan(), ReusedExchange subtrees are
    skipped (they re-read a counted exchange), and each InMemoryRelation's
    build subtree is counted exactly once per op (keyed by the JVM
    identity of its cache builder)."""
    ident = spark._jvm.java.lang.System.identityHashCode
    shuffles = bcasts = py = 0
    cartesian = False
    seen_caches: set[int] = set()
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            stack.append(node.initialPlan())
            continue
        if cls.endswith("QueryStageExec") or cls.startswith("ResultQueryStage"):
            stack.append(node.plan())
            continue
        if cls == "ReusedExchangeExec":
            continue
        if cls == "InMemoryTableScanExec":
            rel = node.relation()
            key = ident(rel.cacheBuilder())
            if key not in seen_caches:
                seen_caches.add(key)
                stack.append(rel.cacheBuilder().cachedPlan())
            continue
        if cls == "ShuffleExchangeExec":
            part = node.outputPartitioning().getClass().getSimpleName()
            if part in ("HashPartitioning", "RangePartitioning"):
                shuffles += 1
        elif cls == "BroadcastExchangeExec":
            bcasts += 1
        elif cls in _PY_EXECS:
            py += 1
        elif cls == "CartesianProductExec":
            cartesian = True
        kids = node.children()
        stack.extend(kids.apply(i) for i in range(kids.size()))
    return shuffles, bcasts, py, cartesian


def main() -> None:
    spark = build_session("shuffle_audit", shuffle_partitions=16)
    rows = []
    errors = []
    for name, fn in sorted(all_queries().items()):
        if name.startswith("stream_"):
            continue  # streaming plans asserted in their own tests
        try:
            df = fn(spark, SF_DIR)
            sh, bc, py, cart = _count_plan_tree(spark, df)
        except Exception as exc:  # pragma: no cover - audit tool
            errors.append(f"{name}: {exc}")
            continue
        rows.append((name, sh, bc, py, cart))
    total_shuffles = sum(r[1] for r in rows)
    heavy = [r for r in rows if r[1] >= 4]
    with open(os.path.join(REPO, "SHUFFLES.md"), "w") as f:
        f.write(
            "# SHUFFLES — per-operator physical-plan accounting\n\n"
            f"Auto-generated by tools/shuffle_audit.py at {os.path.basename(SF_DIR)} "
            "(plans are data-size-dependent only through AQE thresholds; the\n"
            "SHAPE — what shuffles, what broadcasts, what crosses into Python —\n"
            "is the 100 TB contract this table pins).\n\n"
            f"Batch operators audited: **{len(rows)}** · total shuffle exchanges: "
            f"**{total_shuffles}** (mean {total_shuffles / max(len(rows), 1):.2f}/op) · "
            f"cartesian products: **{sum(1 for r in rows if r[4])}** · "
            f"ops with ≥4 shuffles: **{len(heavy)}**\n\n"
            "| operator | shuffles | broadcasts | python-boundary | cartesian | note (>=10 shuffles) |\n"
            "|---|---|---|---|---|---|\n"
        )
        for name, sh, bc, py, cart in rows:
            note = _NOTES.get(name, "") if sh >= 10 else ""
            f.write(
                f"| `{name}` | {sh} | {bc} | {py} | "
                f"{'YES' if cart else ''} | {note} |\n"
            )
        if errors:
            f.write("\n## Build errors\n\n")
            for e in errors:
                f.write(f"- {e}\n")
    print(f"wrote SHUFFLES.md: {len(rows)} ops, {total_shuffles} shuffles, "
          f"{len(errors)} errors")
    spark.stop()


if __name__ == "__main__":
    main()
