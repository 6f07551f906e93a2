"""Custom Python DataSource (Spark 4.x `pyspark.sql.datasource` API) —
the extension point for reading formats/feeds Spark has no built-in
connector for (proprietary telemetry dumps, internal services, …).

`SyntheticSequenceDataSource` is a deterministic generator: N rows split
across P partitions, each row derived from its id by a fixed formula — so
a DuckDB oracle can reproduce it exactly with generate_series. The shape
(partitions() → read(partition) iterator) is exactly what a real connector
implements; partition planning is what makes it scale-out."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ..registry import register


class _SeqPartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticSequenceReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _SeqPartition(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _SeqPartition):
        for i in range(partition.start, partition.end):
            # deterministic pseudo-measurement, reproducible in SQL
            yield (i, i % 5, float((i * 7919) % 1000) / 10.0)


class SyntheticSequenceDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthseq"

    def schema(self) -> str:
        return "seq_id long, bucket long, reading double"

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticSequenceReader(self.options)


@register(
    "src_custom_datasource",
    oracle="""
    SELECT bucket,
           count(*) AS cnt,
           round(sum(reading), 2) AS reading_sum
    FROM (SELECT i AS seq_id, i % 5 AS bucket,
                 CAST((i * 7919) % 1000 AS DOUBLE) / 10.0 AS reading
          FROM (SELECT unnest(generate_series(0, 9999)) AS i))
    GROUP BY bucket
    """,
)
def src_custom_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read through the custom Python DataSource (8 planned partitions) and
    aggregate; the oracle reproduces the generator formula in SQL."""
    spark.dataSource.register(SyntheticSequenceDataSource)
    df = (
        spark.read.format("synthseq")
        .option("rows", 10000)
        .option("partitions", 8)
        .load()
    )
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum("reading"), 2).alias("reading_sum"),
    )


class SyntheticSequenceStreamReader:
    """SimpleDataSourceStreamReader: offset-tracked deterministic replay of
    the same generator formula, 1000 rows per micro-batch, capped at
    ``rows``. read(start) is a pure function of the offset, so checkpoint
    recovery replays identical batches (exactly-once end state)."""

    def __init__(self, options):
        self.cap = int(options.get("rows", 5000))
        self.batch = int(options.get("batchRows", 1000))

    def initialOffset(self):
        return {"pos": 0}

    def read(self, start):
        lo = start["pos"]
        hi = min(lo + self.batch, self.cap)
        end = {"pos": hi}
        return iter([self._row(i) for i in range(lo, hi)]), end

    def readBetweenOffsets(self, start, end):
        return iter([self._row(i) for i in range(start["pos"], end["pos"])])

    def commit(self, end):
        pass

    @staticmethod
    def _row(i: int):
        return (i, i % 5, float((i * 7919) % 1000) / 10.0)


class SyntheticSequenceStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthseqstream"

    def schema(self) -> str:
        return "seq_id long, bucket long, reading double"

    def simpleStreamReader(self, schema: StructType):
        return SyntheticSequenceStreamReader(self.options)


@register(
    "src_custom_stream_source",
    oracle="""
    SELECT bucket,
           count(*) AS cnt,
           round(sum(reading), 2) AS reading_sum
    FROM (SELECT i AS seq_id, i % 5 AS bucket,
                 CAST((i * 7919) % 1000 AS DOUBLE) / 10.0 AS reading
          FROM (SELECT unnest(generate_series(0, 4999)) AS i))
    GROUP BY bucket
    """,
)
def src_custom_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING custom Python DataSource (Spark 4
    ``simpleStreamReader``): the offset-based contract a real feed
    connector implements — initialOffset / read(start)→(rows, end) /
    readBetweenOffsets for checkpoint replay. The deterministic generator
    emits 5 000 rows in 1 000-row micro-batches; the memory-sink end state
    after the source reaches its cap equals the batch formula, so the SQL
    oracle is exact. Complements src_custom_datasource (the batch half of
    the same API)."""
    import time

    spark.dataSource.register(SyntheticSequenceStreamSource)
    stream = (
        spark.readStream.format("synthseqstream")
        .option("rows", 5000)
        .option("batchRows", 1000)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("custom_stream_sink")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM custom_stream_sink").first()["c"] >= 5000:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    return spark.sql(
        """
        SELECT bucket,
               count(*) AS cnt,
               round(sum(reading), 2) AS reading_sum
        FROM custom_stream_sink GROUP BY bucket
        """
    )


class _WroteRows(WriterCommitMessage):
    def __init__(self, n: int):
        self.n = n


class CsvDirWriter(DataSourceWriter):
    """Per-partition writer: each task writes its rows to one CSV file
    named by its partition id (deterministic layout), returns a commit
    message with its row count — the two-phase commit shape every real
    sink implements (tasks write, driver commits)."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        import os

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, f"part-{pid:05d}.csv"), "w") as f:
            for row in iterator:
                f.write(f"{row[0]},{row[1]}\n")
                n += 1
        return _WroteRows(n)


class CsvDirSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "csvdirsink"

    def schema(self) -> str:
        return "k long, cents long"

    def writer(self, schema: StructType, overwrite: bool) -> DataSourceWriter:
        return CsvDirWriter(self.options)


@register(
    "src_custom_datasink",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 2)
             AS total_value
    FROM orders
    """,
)
def src_custom_datasink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE path of the Python DataSource API (Spark 4.x
    ``DataSourceWriter``): orders are pushed through a custom per-
    partition CSV sink (task-writes + commit messages — the two-phase
    protocol real connectors implement), then read back with the builtin
    CSV reader and checksummed against the source table. Completes the
    custom-connector story: src_custom_datasource covers batch read,
    src_custom_stream_source streaming read, this the write leg."""
    import os
    import shutil

    from ._scratch import scratch_dir

    spark.dataSource.register(CsvDirSinkDataSource)
    d = scratch_dir(f"csvsink_{os.path.basename(sf_dir)}")
    shutil.rmtree(d, ignore_errors=True)
    from ..schemas import load

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    orders.write.format("csvdirsink").option("path", d).mode("append").save()
    back = spark.read.schema("k long, cents long").csv(d)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("cents") / F.expr("double(100)"), 2).alias("total_value"),
    )
