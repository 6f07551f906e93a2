"""Shared helpers for operator modules.

Canonicalization rules (SURVEY.md §5.3) live here so every operator applies
them identically:

* ``money(col)``   — round(x, 2) for currency aggregates (double, not decimal).
* ``ratio(col)``   — round(x, 6) for ratios / similarities / stats.
* events.ts is timestamp[us] parquet (regen 2026-08-13; was ns through round
  2). ``EVENTS_TS_US`` below is now an identity cast in DuckDB — kept so
  every oracle stays unit-explicit and the legacy ns path (schemas.load
  footer branch) still canonicalizes identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import load

#: DuckDB-side µs-canonical view of events.ts (identity on the µs corpus).
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
