"""TPC-H scale-sanity (records → BASELINE.md "Adapted TPC-H" section).

Amplifies BOTH fact tables k× in memory (each copy's orderkey offset by
copy-index, so lineitem⋈orders cardinality — and every downstream group —
scales linearly, unlike a naive same-key union which would square the join)
and times two suite shapes whose plans must hold at 100 TB:

  q03 — broadcast-dim + fact join + cents-key TakeOrderedAndProject
  q08 — 7-table star, every dim broadcast, one fact shuffle

Usage: python tools/tpch_scale_bench.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, ".")
from highspeedrailwaybigdatasystem_spark.schemas import load  # noqa: E402
from highspeedrailwaybigdatasystem_spark.session import build_session  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEY_STRIDE = 10_000_000  # > max orderkey at any test sf


def amplify(df: DataFrame, key_cols: list[str], k: int) -> DataFrame:
    out = df
    for i in range(1, k):
        shifted = df
        for c in key_cols:
            shifted = shifted.withColumn(c, F.col(c) + i * KEY_STRIDE)
        out = out.unionAll(shifted)
    return out


def q03(li: DataFrame, orders: DataFrame, cust: DataFrame) -> DataFrame:
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.where(F.col("l_shipdate") > F.lit("1998-06-30").cast("timestamp"))
        .join(
            orders.where(F.col("o_orderdate") < F.lit("1998-06-30").cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(rev, 2).alias("revenue"),
            F.round(rev * 100, 0).cast("bigint").alias("_cents"),
        )
        .orderBy(F.col("_cents").desc(), "o_orderkey")
        .limit(10)
    )


def q08(li, orders, cust, part, supp, nation, region):
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n1 = nation.join(
        F.broadcast(region.where(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select(F.col("n_nationkey").alias("n1_key"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    return (
        li.join(
            F.broadcast(part.where(F.col("p_type").startswith("ECONOMY")).select("p_partkey")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(
            orders.where(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_2", vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


def main() -> None:
    spark = build_session("tpch-scale", shuffle_partitions=64)
    base = {n: load(spark, SF_DIR, n) for n in
            ["lineitem", "orders", "customer", "part", "supplier", "nation", "region"]}
    for k in (1, 10, 50):
        li = amplify(base["lineitem"], ["l_orderkey"], k).cache()
        orders = amplify(base["orders"], ["o_orderkey"], k).cache()
        n_li = li.count()  # materialize the cache so IO isn't in the timing
        orders.count()
        for name, build in (
            ("q03", lambda: q03(li, orders, base["customer"])),
            ("q08", lambda: q08(li, orders, base["customer"], base["part"],
                                base["supplier"], base["nation"], base["region"])),
        ):
            build().collect()  # warm plan+codegen
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                build().collect()
                best = min(best, time.perf_counter() - t0)
            print(f"k={k:>2} rows={n_li:>9,} {name}: {best:6.2f} s", flush=True)
        li.unpersist()
        orders.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
