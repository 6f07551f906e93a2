"""Per-operator scale measurement: time registry ops at two corpus scales.

Times each named op at the base dir (default /root/testdata/sf0.1) and the
amplified dir (default _scratch/sf1, 10× via gen_sf_amplify.py), warm
best-of-2 on a shared local[32] session, and prints one markdown row per op
ready for the BASELINE.md round scale table. The ratio column is the
100 TB smoke alarm: a bounded-grain op should sit ≈1×, a linear-in-rows
scoring pass ≈10×, anything super-linear gets investigated or re-planned.

Usage:
    python tools/op_scale_bench.py op1 op2 ...
    python tools/op_scale_bench.py --base DIR --big DIR op1 ...
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def _time_op(fn, spark, sf_dir: str, drive: str = "collect", reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        if drive == "count":
            df.count()
        else:
            df.collect()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ops", nargs="+")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="_scratch/sf1")
    ap.add_argument(
        "--drive", choices=("collect", "count"), default="collect",
        help="how to force execution: 'collect' (default, matches bench "
        "semantics) or 'count' for audit ops whose OUTPUT scales with the "
        "corpus (a 1000x geo pair set blows driver.maxResultSize under "
        "collect; count keeps the full computation but leaves results "
        "distributed, like the survival sweep does)",
    )
    ap.add_argument(
        "--once", action="store_true",
        help="single timed run per tier instead of warm best-of-2 — for "
        "expensive probes (1000x streaming state tiers run ~15 min each; "
        "exponent classification does not need best-of-2 precision there)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry.queries()
    rows = []
    for name in args.ops:
        fn = queries[name]
        reps = 1 if args.once else 2
        small = _time_op(fn, spark, args.base, args.drive, reps)
        big = _time_op(fn, spark, args.big, args.drive, reps)
        ratio = big / small if small > 0 else float("inf")
        rows.append((name, small, big, ratio))
        print(
            f"| {name} | {small:.2f} s | {big:.2f} s | {ratio:.1f}x |",
            flush=True,
        )
    worst = max(rows, key=lambda r: r[3])
    print(f"\nworst ratio: {worst[0]} {worst[3]:.1f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
