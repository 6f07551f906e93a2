"""registry.plan_memo semantics (round 12): plan REUSE, never result reuse.

Catalyst planning of a fresh DataFrame was 50-90% of each headline query's
warm wall-clock at sf0.1, so pure headline ops memoize their constructed
DataFrame per (op, session, sf_dir, corpus fingerprint). These tests pin
the contract that makes that safe."""

from __future__ import annotations

import shutil

from highspeedrailwaybigdatasystem_spark import registry
from highspeedrailwaybigdatasystem_spark.registry import all_queries, plan_memo
from highspeedrailwaybigdatasystem_spark.sources._scratch import scratch_dir
from tests.conftest import SF_ORACLE

SF_SMOKE = "/root/testdata/sf0.001"


def test_memo_returns_same_plan_object_per_key(spark):
    qs = all_queries()
    a = qs["agg_scan_group"](spark, SF_ORACLE)
    b = qs["agg_scan_group"](spark, SF_ORACLE)
    assert a is b, "same (op, session, sf, fingerprint) must reuse the plan"
    c = qs["agg_scan_group"](spark, SF_SMOKE)
    assert c is not a, "a different sf_dir must construct a fresh plan"
    # and the reused plan re-executes: same values both collects
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_memo_hit_values_match_fresh_execution(spark):
    """A memo hit may legitimately serve AQE-materialized shuffle stages
    (that is the serving-mode point), so the guarantee to pin is
    VALUE-level: a repeat collect of the memoized plan must equal a fully
    fresh construction+execution of the same op (what every correctness
    gate performs), across a clearCache() in between."""
    qs = all_queries()
    df = qs["llm_exact_dedup"](spark, SF_ORACLE)
    memo_hit = sorted(map(tuple, df.collect()))
    spark.catalog.clearCache()
    fresh_fn = qs["llm_exact_dedup"].__wrapped__
    fresh = sorted(map(tuple, fresh_fn(spark, SF_ORACLE).collect()))
    assert memo_hit == fresh


def test_memo_invalidates_on_corpus_fingerprint_change(spark):
    """An in-place corpus regeneration (new mtime/size) must rebuild the
    plan: copy the smoke corpus to scratch, query it, overwrite one table
    with the oracle tier's copy, and check the memoized entry is NOT
    reused (row counts differ with the corpus)."""
    import os
    import time

    d = scratch_dir("plan_memo_corpus")
    shutil.rmtree(d, ignore_errors=True)
    shutil.copytree(SF_SMOKE, d)
    qs = all_queries()
    small = qs["topk_global"](spark, d)
    n_small = small.count()
    time.sleep(0.02)  # ensure a distinct mtime on fast filesystems
    shutil.copy(f"{SF_ORACLE}/lineitem.parquet", os.path.join(d, "lineitem.parquet"))
    fresh = qs["topk_global"](spark, d)
    assert fresh is not small, "fingerprint change must invalidate the memo"
    assert fresh.count() >= n_small


def test_memo_only_on_pure_ops():
    """plan_memo must never wrap side-effectful operators: sinks re-write
    files, streaming ops run queries, scratch-staging ops copy corpora —
    memoizing any of those would silently skip their effect on repeat
    calls. Pin the opt-in list to pure prefixes."""
    impure_prefixes = ("src_", "sink_", "stream_", "etl_scd", "mm_")
    # functools.wraps copies __module__/__name__ from the wrapped op, so
    # detect memoization via the __wrapped__ attribute (plan_memo is the
    # registry's only wraps-based decorator — this list IS the opt-in set)
    memoized = [
        name
        for name, fn in all_queries().items()
        if getattr(fn, "__wrapped__", None) is not None
    ]
    bad = [n for n in memoized if n.startswith(impure_prefixes)]
    assert not bad, f"plan_memo on side-effectful ops: {bad}"
    assert "agg_scan_group" in memoized and "llm_minhash_banding" in memoized


def test_memo_keyed_on_jvm_session_uuid(spark):
    """Session identity is the JVM session's sessionUUID, not id() of the
    py4j proxy (ADVICE r12): two Python wrappers of ONE JVM session must
    share memo entries, while a sibling newSession() clone (same
    applicationId, own conf/temp-view state) must get its own."""
    from pyspark.sql import SparkSession

    qs = all_queries()
    a = qs["agg_scan_group"](spark, SF_ORACLE)
    # a second Python wrapper of the same JVM session: same UUID -> hit
    twin = SparkSession(spark.sparkContext, spark._jsparkSession)
    assert str(twin._jsparkSession.sessionUUID()) == str(
        spark._jsparkSession.sessionUUID()
    )
    b = qs["agg_scan_group"](twin, SF_ORACLE)
    assert b is a, "wrapper of the same JVM session must hit the memo"
    # a sibling session clone: distinct UUID -> own entry
    clone = spark.newSession()
    try:
        assert str(clone._jsparkSession.sessionUUID()) != str(
            spark._jsparkSession.sessionUUID()
        )
        c = qs["agg_scan_group"](clone, SF_ORACLE)
        assert c is not a, "newSession() clone must not share memo entries"
    finally:
        # no stop(): the clone shares the SparkContext with the suite
        pass
