"""100×-tier survival sweep: run registry ops against an amplified corpus.

The 10× tables in BASELINE.md measure RATIOS; this tool answers a blunter
question the 10× tier provably cannot (round 10: the minhash broadcast OOM
appeared only at 100×): does each operator COMPLETE at a two-orders-of-
magnitude corpus without a planner blow-up (forced broadcast OOM, driver
collect explosion, runaway cartesian)? Each op runs under a job-group
watchdog; on timeout its Spark jobs are cancelled and the op is recorded
TIMEOUT rather than blocking the sweep. Output: one line per op —
``OK <rows> <sec>`` / ``TIMEOUT`` / ``FAIL <error>``.

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
import sys
import threading
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="*")
    ap.add_argument("--sf", default="_scratch/sf10")
    ap.add_argument("--timeout", type=float, default=100.0)
    args = ap.parse_args()

    import __spark_entry__ as mod
    from highspeedrailwaybigdatasystem_spark.session import build_session

    spark = build_session("scale-survival", shuffle_partitions=256)
    sc = spark.sparkContext
    qs = mod.queries()
    names = args.ops or list(qs)

    n_ok = n_to = n_fail = 0
    for name in names:
        group = f"survival-{name}"
        sc.setJobGroup(group, name, interruptOnCancel=True)
        done = threading.Event()

        def watchdog() -> None:
            if not done.wait(args.timeout):
                sc.cancelJobGroup(group)

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
        finally:
            done.set()
            sc.setJobGroup("", "")
    print(f"survival: {n_ok} ok, {n_to} timeout, {n_fail} fail / {len(names)}")


if __name__ == "__main__":
    main()
