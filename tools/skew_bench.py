"""Skew-join A/B measurement (records → BASELINE.md "Skew" section).

Synthesizes a deliberately skewed fact table (50% of rows on one hot key,
rest uniform over 10 k keys) and times the same shuffle join + aggregate
under three regimes:

  naive   — AQE skew-join splitting disabled (what a 100 TB job suffers
            when one reducer gets half the data)
  aqe     — AQE skew-join splitting on (Spark's automatic mitigation:
            oversized partitions split at runtime)
  salted  — explicit deterministic salt on the fact side × exploded dim
            (the join_skew_salted op's strategy; works even where AQE
            can't, e.g. aggregation keys or stream-static joins)

Broadcast is disabled so the join genuinely shuffles both sides.

Usage: python tools/skew_bench.py [n_rows]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
SALT = 32


def build(app: str, skew_on: bool) -> SparkSession:
    return (
        SparkSession.builder.master("local[32]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        # default 256m threshold never fires at this toy size — scale the
        # trigger down so the run demonstrates the splitting mechanism
        .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )


def fact(spark: SparkSession):
    # 50% hot key 0, rest uniform over 10k keys — deterministic from id
    return spark.range(N).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.hash("id"), F.lit(10_000)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )


def dim(spark: SparkSession):
    return spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("w")
    )


def run_naive_or_aqe(spark: SparkSession) -> float:
    t0 = time.monotonic()
    (
        fact(spark)
        .join(dim(spark), "k")
        .groupBy("w")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return time.monotonic() - t0


def run_salted(spark: SparkSession) -> float:
    t0 = time.monotonic()
    f = fact(spark).withColumn("salt", F.pmod(F.hash("v"), F.lit(SALT)))
    d = dim(spark).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(SALT - 1))))
    (
        f.join(d, ["k", "salt"])
        .groupBy("w")
        .agg(F.sum("v").alias("sv"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return time.monotonic() - t0


def main() -> None:
    results = {}
    for mode, skew_on in (("naive", False), ("aqe", True)):
        spark = build(f"skew-{mode}", skew_on)
        run_naive_or_aqe(spark)  # warm (plan + codegen)
        results[mode] = min(run_naive_or_aqe(spark) for _ in range(2))
        if mode == "aqe":
            results["salted"] = min(run_salted(spark) for _ in range(2))
        spark.stop()
    print({"rows": N, "hot_fraction": 0.5, **{k: round(v, 2) for k, v in results.items()}})


if __name__ == "__main__":
    main()
