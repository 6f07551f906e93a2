"""Declared schemas for the ground-truth corpus (FIXTURES.md §2).

Schemas are declared, not inferred, so that timestamp units and integer
widths can't drift between reads (SURVEY.md §1.3). ``load`` reads a table
and asserts the on-disk schema matches the declaration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _st(*fields: tuple) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


SCHEMAS: dict[str, StructType] = {
    "region": _st(
        ("r_regionkey", IntegerType()),
        ("r_name", StringType()),
    ),
    "nation": _st(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _st(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _st(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _st(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _st(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _st(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _st(
        ("event_id", LongType()),
        ("ts", TimestampType()),  # ns in parquet; Spark truncates to µs (FIXTURES.md)
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),  # JSON string, shape {"k": <int>}
    ),
    "documents": _st(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _st(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),  # fixed dim 64, L2-normalized
        ("label", IntegerType()),
    ),
}

TABLE_NAMES = tuple(SCHEMAS)

EMBEDDING_DIM = 64

#: events.ts is TIMESTAMP(NANOS) in parquet, which Spark 4.x cannot read as
#: a timestamp at all (PARQUET_TYPE_ILLEGAL). With
#: spark.sql.legacy.parquet.nanosAsLong=true (set in session.py) the column
#: arrives as a raw ns-since-epoch long; ``load`` converts it to a µs
#: TimestampType with exact integer division (``div``, not ``/`` — ns epochs
#: exceed double's 2^53 exact-integer range). The corpus has zero sub-µs
#: components (FIXTURES.md), so the conversion is lossless and matches
#: DuckDB's CAST(ts AS TIMESTAMP) µs view used in every oracle.
EVENTS_READ_SCHEMA = _st(
    ("event_id", LongType()),
    ("ts", LongType()),
    ("user_id", LongType()),
    ("event_type", StringType()),
    ("value", DoubleType()),
    ("props", StringType()),
)


def _events_ts_to_timestamp(df: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one corpus table.

    The declared schema is passed to the reader so every downstream plan
    sees identical types regardless of parquet footer details; column
    pruning and predicate pushdown still apply (schema is a projection
    contract, not a cast).
    """
    if name == "events":
        raw = spark.read.schema(EVENTS_READ_SCHEMA).parquet(f"{sf_dir}/events.parquet")
        return _events_ts_to_timestamp(raw)
    return spark.read.schema(SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every corpus table as a temp view (SQL-surface entry point)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
