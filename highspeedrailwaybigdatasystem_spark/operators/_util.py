"""Shared helpers for operator modules.

Canonicalization rules (SURVEY.md §5.3) live here so every operator applies
them identically:

* ``money(col)``   — round(x, 2) for currency aggregates (double, not decimal).
* ``ratio(col)``   — round(x, 6) for ratios / similarities / stats.
* events.ts is nanosecond parquet; Spark truncates to µs on read. Oracle SQL
  must therefore reference it as ``CAST(ts AS TIMESTAMP)`` (DuckDB µs) — the
  ``EVENTS_TS_US`` snippet below is interpolated into oracles for that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load

#: DuckDB-side µs-canonical view of events.ts (parquet is ns; Spark reads µs).
EVENTS_TS_US = "CAST(ts AS TIMESTAMP)"


def money(col: Column | str) -> Column:
    return F.round(F.col(col) if isinstance(col, str) else col, 2)


def ratio(col: Column | str) -> Column:
    return F.round(F.col(col) if isinstance(col, str) else col, 6)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table with its declared schema."""
    return load(spark, sf_dir, name)


def events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts already µs (Spark-side no-op; mirrors EVENTS_TS_US)."""
    return t(spark, sf_dir, "events")
