#!/usr/bin/env python3
"""Probe for Avro / Delta Lake availability and exercise them if present.

SURVEY.md "What's missing" items 1-2: `spark-avro` and Delta are external
artifacts this container cannot fetch (no network). On a real cluster they
are one `--packages` flag away:

    spark-submit --packages org.apache.spark:spark-avro_2.13:4.1.2,\
io.delta:delta-spark_2.13:4.0.0 ...

This script turns those gaps into one-command coverage the moment an env
CAN load the jars. It is a safe no-op here: each probe is gated on the
capability actually working, prints PASS / UNAVAILABLE per feature, and
exits 0 either way (exit 1 only if a probe that STARTED then failed —
i.e. a real bug, not a missing jar).

    python tools/probe_external_formats.py [--packages <maven-coords>]

With --packages, the coordinates are injected via spark.jars.packages
before session build (requires network or a populated ivy cache).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"


def probe_avro(spark) -> str:
    """Round-trip region through Avro files + to_avro/from_avro exprs."""
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    df = spark.read.parquet(f"{SF_SMOKE}/region.parquet")
    try:
        # expression-level first: fails fast with AVRO_NOT_LOADED_... when
        # the jar is absent (probed artifact in SURVEY.md §2.12)
        from pyspark.sql.avro.functions import to_avro, from_avro  # noqa: F401

        df.select(to_avro(F.struct("*")).alias("b")).limit(1).collect()
    except Exception as e:  # noqa: BLE001 — any jar-missing shape
        if "AVRO" in str(e).upper() or isinstance(e, (ImportError, AnalysisException)):
            return "UNAVAILABLE (spark-avro jar not on classpath)"
        raise
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "region_avro")
        df.write.format("avro").save(path)
        back = spark.read.format("avro").load(path)
        assert back.count() == df.count(), "avro round-trip row-count mismatch"
        assert set(back.columns) == set(df.columns)
    return "PASS (file + expression round-trip)"


def probe_delta(spark) -> str:
    """CREATE a Delta table, MERGE an upsert, time-travel to version 0."""
    try:
        from delta.tables import DeltaTable  # noqa: F401
    except ImportError:
        return "UNAVAILABLE (delta-spark not importable)"
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "nation_delta")
        try:
            df.write.format("delta").save(path)
        except Exception as e:  # noqa: BLE001
            return f"UNAVAILABLE (delta write failed: {type(e).__name__})"
        tbl = DeltaTable.forPath(spark, path)
        updates = df.limit(3).withColumn("n_comment", F.lit("updated"))
        (
            tbl.alias("t")
            .merge(updates.alias("u"), "t.n_nationkey = u.n_nationkey")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
        )
        v0 = (
            spark.read.format("delta")
            .option("versionAsOf", 0)
            .load(path)
            .filter("n_comment = 'updated'")
            .count()
        )
        assert v0 == 0, "time-travel to v0 must predate the MERGE"
        now = (
            spark.read.format("delta")
            .load(path)
            .filter("n_comment = 'updated'")
            .count()
        )
        assert now == 3, f"MERGE should update 3 rows, saw {now}"
    return "PASS (write + MERGE + time-travel)"


def probe_protobuf_tws(spark) -> str:
    """transformWithStateInPandas (the arbitrary-stateful-processing API
    stream_custom_state would upgrade to) needs the ``google.protobuf``
    python package on every worker — its state-server client speaks
    proto (pyspark/sql/streaming/proto/StateMessage_pb2.py). This env
    lacks it (r11 verdict task #8: notice the round an env upgrade lands),
    so stream_custom_state ships on applyInPandasWithState instead."""
    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        return "UNAVAILABLE (google.protobuf not importable; TWS blocked)"
    # package present: prove the client stack actually loads its generated
    # proto module, then drive one micro-batch end-to-end.
    from pyspark.sql.streaming.proto import StateMessage_pb2  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountProc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            from pyspark.sql.types import IntegerType, StructField, StructType

            self._c = handle.getValueState(
                "c", StructType([StructField("n", IntegerType())])
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = sum(len(b) for b in rows)
            prev = self._c.get()
            total = n + (prev[0] if prev else 0)
            self._c.update((total,))
            yield pd.DataFrame({"id": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    from pyspark.sql import functions as F

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "100").load()
        .select((F.col("value") % 4).alias("id"))
    )
    q = (
        src.groupBy("id")
        .transformWithStateInPandas(
            CountProc(),
            outputStructType="id bigint, n int",
            outputMode="Update",
            timeMode="None",
        )
        .writeStream.format("memory")
        .queryName("tws_probe")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    q.stop()
    assert spark.table("tws_probe").count() >= 0
    return "PASS (transformWithStateInPandas micro-batch ran)"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--packages",
        default=os.environ.get("SPARK_GRAFT_PACKAGES", ""),
        help="maven coordinates for spark.jars.packages (needs network/ivy cache)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[4]")
        .appName("probe-external-formats")
        .config("spark.sql.shuffle.partitions", "4")
    )
    if args.packages:
        b = b.config("spark.jars.packages", args.packages)
        # delta additionally needs its catalog extension wired pre-session
        if "delta" in args.packages:
            b = b.config(
                "spark.sql.extensions",
                "io.delta.sql.DeltaSparkSessionExtension",
            ).config(
                "spark.sql.catalog.spark_catalog",
                "org.apache.spark.sql.delta.catalog.DeltaCatalog",
            )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    failed = False
    for name, probe in (
        ("avro", probe_avro),
        ("delta", probe_delta),
        ("protobuf/TWS", probe_protobuf_tws),
    ):
        try:
            print(f"{name}: {probe(spark)}")
        except Exception as e:  # noqa: BLE001 — probe STARTED then broke
            failed = True
            print(f"{name}: FAIL ({type(e).__name__}: {e})")
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
