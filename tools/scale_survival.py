"""100×-tier survival sweep: run registry ops against an amplified corpus.

The 10× tables in BASELINE.md measure RATIOS; this tool answers a blunter
question the 10× tier provably cannot (round 10: the minhash broadcast OOM
appeared only at 100×): does each operator COMPLETE at a two-orders-of-
magnitude corpus without a planner blow-up (forced broadcast OOM, driver
collect explosion, runaway cartesian)? Each op runs under a job-group
watchdog; on timeout its Spark jobs are cancelled and the op is recorded
TIMEOUT rather than blocking the sweep. After any FAIL the SparkContext is
health-probed and rebuilt if dead (round 11: one OOM used to cascade into
false FAILs for every later op), and the estimator/streaming ops most
likely to OOM the shared JVM run last. Output: one line per op —
``OK <rows> <sec>`` / ``TIMEOUT`` / ``FAIL <error>`` (+ ``RESTART`` marks).

TIMEOUT is not automatically a defect: on the amplified corpus every
payload repeats ``--copies`` times verbatim, so pair-generating ops'
true output is ~copies² larger (exact-collapse-first is the documented
production convention — see BASELINE.md round-10 notes). The sweep's
gold is FAIL rows: those are planner/memory defects, not workload shape.

Usage:
    python tools/scale_survival.py [--sf DIR] [--timeout SEC] [op ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, ".")


#: estimator-valued / streaming-state ops most likely to OOM the shared
#: JVM — run LAST so a crash can't poison the batch tier (round-10 lesson:
#: one heap OOM killed the context and 11 later ops recorded false FAILs).
_RUN_LAST_PREFIXES = ("stream_", "agg_approx_distinct", "agg_hll_sketch", "llm_ann_lsh")


def _context_alive(spark) -> bool:
    """True iff the shared SparkContext can still run a trivial job."""
    try:
        return spark.range(1).count() == 1
    except Exception:  # noqa: BLE001
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*")
    ap.add_argument("--sf", default="_scratch/sf10")
    ap.add_argument("--timeout", type=float, default=100.0)
    ap.add_argument(
        "--resume-tail", action="store_true",
        help="internal: this run is the crash-handoff child re-executing "
        "the parent sweep's remaining ops; suppress the POOL header (the "
        "parent already printed the whole sweep's denominator)",
    )
    args = ap.parse_args()

    import __spark_entry__ as mod
    from highspeedrailwaybigdatasystem_spark.session import build_session

    def fresh_session():
        return build_session("scale-survival", shuffle_partitions=256)

    spark = fresh_session()
    qs = mod.queries()
    names = args.ops or list(qs)
    # Denominator transparency (r15 verdict task #3: the round-15 sweep
    # reported 489/489 OK against a 491-op registry and nothing named the
    # 2 missing ops — an explicit CLI op list had been drawn before two
    # late-round registrations). The headline claim must state its pool:
    # print pool size AND name every registered op NOT in this sweep, so
    # a stale op list can never silently shrink the denominator again.
    excluded = sorted(set(qs) - set(names))
    unknown = sorted(set(names) - set(qs))
    if not args.resume_tail:
        print(
            f"POOL {len(names)}/{len(qs)} registry ops"
            + (f"; EXCLUDED: {', '.join(excluded)}" if excluded else "; EXCLUDED: none"),
            flush=True,
        )
    if unknown:
        raise SystemExit(f"unknown ops requested: {', '.join(unknown)}")
    # crash-prone tail last, stable relative order otherwise
    names = sorted(names, key=lambda n: n.startswith(_RUN_LAST_PREFIXES))

    n_ok = n_to = n_fail = n_restart = 0
    for name in names:
        sc = spark.sparkContext
        group = f"survival-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        done = threading.Event()

        def watchdog(sc=sc, group=group, done=done) -> None:
            if not done.wait(args.timeout):
                try:
                    sc.cancelJobGroup(group)
                except Exception:  # noqa: BLE001
                    pass  # context died mid-op; the main thread handles it

        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        t0 = time.monotonic()
        try:
            rows = qs[name](spark, args.sf).count()
            print(f"OK {name} rows={rows} {time.monotonic() - t0:.1f}s", flush=True)
            n_ok += 1
        except Exception as ex:  # noqa: BLE001
            el = time.monotonic() - t0
            msg = f"{type(ex).__name__}: {str(ex)[:160]}"
            if el >= args.timeout - 1 and ("cancelled" in msg or "Job" in msg):
                print(f"TIMEOUT {name} >{args.timeout:.0f}s", flush=True)
                n_to += 1
            else:
                print(f"FAIL {name} {el:.1f}s {msg}", flush=True)
                n_fail += 1
            done.set()
            # Cascade-proofing (round 11): a heap OOM can kill the shared
            # local JVM and every later op would FAIL on the dead context
            # (round 10 recorded 11 such false rows). Probe it; if dead,
            # tear down and rebuild so the remaining ops run for real. If
            # the rebuild itself fails (a wedged context never unregisters
            # — assertNoOtherContextIsRunning — or the py4j gateway died
            # with the JVM), re-exec the REMAINING ops in a fresh python
            # subprocess: its output streams through and its summary marks
            # the handoff, so one crash can never silence the tail.
            if not _context_alive(spark):
                try:
                    spark.stop()
                except Exception:  # noqa: BLE001
                    pass
                try:
                    spark = fresh_session()
                    n_restart += 1
                    print(f"RESTART context rebuilt after {name}", flush=True)
                except Exception:  # noqa: BLE001
                    remaining = names[names.index(name) + 1 :]
                    print(
                        f"RESTART in-process rebuild failed after {name};"
                        f" re-exec {len(remaining)} remaining ops in a"
                        " fresh subprocess",
                        flush=True,
                    )
                    # Stream the child's output through while capturing its
                    # final summary line, then MERGE its counts and
                    # propagate its exit status — a crashed child must be
                    # distinguishable from a clean tail, and the printed
                    # totals must cover the whole sweep (ADVICE r11).
                    child_counts, child_rc = (0, 0, 0, 0), 0
                    if remaining:
                        import re as _re
                        import subprocess

                        proc = subprocess.Popen(
                            [
                                sys.executable,
                                os.path.abspath(__file__),
                                "--sf",
                                args.sf,
                                "--timeout",
                                str(args.timeout),
                                "--resume-tail",
                                *remaining,
                            ],
                            stdout=subprocess.PIPE,
                            text=True,
                        )
                        summary = None
                        assert proc.stdout is not None
                        for line in proc.stdout:
                            print(line, end="", flush=True)
                            m = _re.search(
                                r"survival[^:]*: (\d+) ok, (\d+) timeout,"
                                r" (\d+) fail, (\d+) restarts",
                                line,
                            )
                            if m:
                                summary = tuple(int(g) for g in m.groups())
                        child_rc = proc.wait()
                        if summary is None:
                            print(
                                f"HANDOFF CHILD CRASHED (rc={child_rc}, no"
                                " summary line) — totals below understate"
                                f" the {len(remaining)}-op tail",
                                flush=True,
                            )
                            child_rc = child_rc or 1
                        else:
                            child_counts = summary
                    co, ct, cf, cr = child_counts
                    print(
                        f"survival (merged, incl. handoff): {n_ok + co} ok,"
                        f" {n_to + ct} timeout, {n_fail + cf} fail,"
                        f" {n_restart + cr + 1} restarts / {len(names)}"
                    )
                    sys.exit(child_rc)
        finally:
            done.set()
            try:
                spark.sparkContext.setJobGroup("", "")
                # Per-op cache isolation (round 13): without this, 487 ops'
                # cached stages accumulate in the shared JVM until eviction
                # thrash — llm_template_boilerplate_detect reliably timed
                # out in-sweep (>100 s) while running 3 s standalone, and
                # llm_dsir_importance's broadcast OOMed under the same
                # pressure. Each op should survive 100x on ITS OWN plan,
                # not on whatever blocks its 400 predecessors left behind.
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001
                pass
    print(
        f"survival: {n_ok} ok, {n_to} timeout, {n_fail} fail,"
        f" {n_restart} restarts / {len(names)}"
    )


if __name__ == "__main__":
    main()
