"""Pin the round-12 bench honesty redefinitions (r12 verdict task #7).

Two properties made BENCH artifacts trustworthy in r12 and must never
silently regress:

1. The headline ``value`` is measured on FRESH plan constructions —
   ``time_query`` unwraps ``plan_memo`` (``__wrapped__``) so a memoized
   DataFrame can never let AQE serve already-materialized shuffle stages
   into the headline number (that regime is real, but it is serving-mode
   reuse and is reported separately as ``steady_state``).
2. The artifact always carries BOTH comparison ratios —
   ``vs_recorded_baseline`` (gate math vs the recorded r1 baseline) and
   ``vs_steady_state`` (quiet-host steady state) — plus the
   single-threaded fresh-subprocess DuckDB control, so a reader can tell
   code regressions from host load without consulting prose.

These tests exercise bench.py's functions directly (no sf0.1 run): the
timing-path property via a stub callable, and the artifact-shape property
by running main() against the sf0.001 corpus in-process.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_time_query_unwraps_plan_memo(spark):
    """time_query must call the UNWRAPPED callable: every timed run sees a
    fresh DataFrame construction, never the memoized instance."""
    bench = _load_bench()
    calls = {"fresh": 0, "wrapper": 0}

    def fresh_fn(s, sf_dir):
        calls["fresh"] += 1
        return s.range(10)

    import functools

    @functools.wraps(fresh_fn)
    def wrapper(s, sf_dir):
        calls["wrapper"] += 1
        return fresh_fn(s, sf_dir)

    # mimic plan_memo's contract: the wrapper exposes __wrapped__
    bench.time_query(wrapper, spark, runs=2)
    assert calls["wrapper"] == 0, (
        "time_query called the memo wrapper — headline value would "
        "include serving-mode reuse"
    )
    assert calls["fresh"] == 3  # warmup + 2 timed runs


def test_registered_memo_ops_expose_wrapped():
    """Every plan_memo-wrapped registered op must expose __wrapped__ —
    the hook time_query relies on. A memoized op without it would be
    silently timed in serving mode."""
    from highspeedrailwaybigdatasystem_spark import registry

    qs = registry.all_queries()
    bench = _load_bench()
    for bench_name, qname in bench.HEADLINE.items():
        fn = qs[qname]
        if fn.__module__ == "highspeedrailwaybigdatasystem_spark.registry":
            # wrapper defined inside plan_memo — must carry __wrapped__
            assert hasattr(fn, "__wrapped__"), f"{qname}: memo without __wrapped__"


def test_bench_artifact_carries_both_ratios():
    """bench.py's JSON line must always carry vs_recorded_baseline,
    vs_steady_state, steady_state, and the DuckDB control — run as a
    SUBPROCESS against sf0.001 so this stays a smoke and bench's
    spark.stop() cannot kill the suite's shared session (the vs_* fields
    are None off the graded sf0.1 set, but the KEYS must exist)."""
    import subprocess

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    art = json.loads(line)
    for key in (
        "value",
        "queries",
        "steady_state",
        "host_probe",
        "bench_vs_control",
        "vs_recorded_baseline",
        "vs_steady_state",
    ):
        assert key in art, f"BENCH artifact missing {key}"
    assert art["host_probe"]["duckdb_control_sec"] > 0
    assert "note" in art["steady_state"]
