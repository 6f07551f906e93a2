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


def _materialize_cache(spark: SparkSession, *dfs: DataFrame) -> None:
    """count() each cached DataFrame whose in-memory buffers are NOT yet
    built, so downstream queries are planned against the cache's REAL
    InMemoryRelation statistics (see llm_minhash_banding's
    planner-statistics note — unmaterialized cached explodes carry
    pre-explode size estimates, under which Catalyst force-broadcasts the
    whole view: a 3.5 GiB OOM at the 100x corpus). Gating on the actual
    CacheManager state (not a process-global seen-set, round 11) keeps the
    guard correct across spark.catalog.clearCache()/unpersist(): a cleared
    entry re-registers unmaterialized and gets re-counted here. Falls back
    to an unconditional count() if the JVM probe is unavailable."""
    for df in dfs:
        try:
            opt = (
                spark._jsparkSession.sharedState()
                .cacheManager()
                .lookupCachedData(df._jdf)
            )
            loaded = opt.isDefined() and (
                opt.get()
                .cachedRepresentation()
                .cacheBuilder()
                .isCachedColumnBuffersLoaded()
            )
        except Exception:
            loaded = False
        if not loaded:
            df.count()


def sql_q(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    """Run one Spark SQL text over the memoized corpus views.

    The hot-path (bench headline) ops build their plan this way: a single
    ``spark.sql`` parse is one Py4J round-trip, where the equivalent
    Column-expression pipeline costs 25–55 ms per table load plus ~1 ms
    per Column operator in driver-side JVM calls — measured at 0.15–0.33 s
    per query build, dominating sf0.1 wall-clock. The logical/physical
    plan is identical to the DataFrame formulation; Catalyst sees the same
    tree either way.
    """
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(text)


def events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts already µs (Spark-side no-op; mirrors EVENTS_TS_US)."""
    return t(spark, sf_dir, "events")
