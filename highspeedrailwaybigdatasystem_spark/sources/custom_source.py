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
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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
