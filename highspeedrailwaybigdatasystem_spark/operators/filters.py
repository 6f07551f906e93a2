"""Filter / projection / predicate operators (SURVEY.md §2.2).

All predicates here are sargable compositions of built-in expressions —
they stay inside whole-stage codegen and push down to the parquet scan
where the format allows (AND-of-comparisons does; OR pushes as a tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, t


@register(
    "filt_pred_and_or",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
    FROM lineitem
    WHERE (l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24) OR l_tax = 0.0
    """,
)
def filt_pred_and_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    pred = (
        F.col("l_discount").between(0.02, 0.06) & (F.col("l_quantity") < 24)
    ) | (F.col("l_tax") == 0.0)
    return li.where(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_tax"
    )


@register(
    "filt_in_list",
    oracle="""
    SELECT o_orderkey, o_orderpriority FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def filt_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select("o_orderkey", "o_orderpriority")
    )


@register(
    "filt_like",
    oracle="""
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_type LIKE 'PROMO%' OR p_name LIKE '%a%'
    """,
)
def filt_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.where(
        F.col("p_type").like("PROMO%") | F.col("p_name").like("%a%")
    ).select("p_partkey", "p_name", "p_type")


@register(
    "filt_null_safe",
    oracle="""
    SELECT (o_orderstatus IS NOT DISTINCT FROM 'F') AS is_f, count(*) AS cnt
    FROM customer
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderdate >= TIMESTAMP '1995-01-01'
                 AND o_orderdate <  TIMESTAMP '1995-03-01') o
      ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def filt_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality over outer-join-manufactured NULLs (the corpus has
    none of its own — FIXTURES.md §3): <=> groups NULL separately from
    'F'-mismatch, exactly like IS NOT DISTINCT FROM."""
    customer = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
    )
    return (
        customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy(F.col("o_orderstatus").eqNullSafe(F.lit("F")).alias("is_f"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "null_handling",
    oracle="""
    SELECT c_custkey,
           (o_orderkey IS NOT NULL) AS has_order,
           coalesce(o_orderstatus, 'NONE') AS status_filled,
           coalesce(o_totalprice, 0.0) AS price_filled,
           nullif(coalesce(o_orderstatus, 'F'), 'F') AS status_nullifs
    FROM customer
    LEFT JOIN (SELECT * FROM orders
               WHERE o_orderpriority = '1-URGENT'
                 AND o_orderdate >= TIMESTAMP '2001-01-01') o
      ON c_custkey = o_custkey
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling battery over outer-join-manufactured NULLs (the corpus
    itself has none — FIXTURES.md §3): isNotNull, coalesce, na.fill,
    nullif."""
    customer = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("2001-01-01").cast("timestamp"))
    )
    joined = customer.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
    filled = joined.na.fill({"o_totalprice": 0.0})  # DataFrameNaFunctions path
    return filled.select(
        "c_custkey",
        F.col("o_orderkey").isNotNull().alias("has_order"),
        F.coalesce("o_orderstatus", F.lit("NONE")).alias("status_filled"),
        F.col("o_totalprice").alias("price_filled"),
        F.nullif(F.coalesce("o_orderstatus", F.lit("F")), F.lit("F")).alias(
            "status_nullifs"
        ),
    )


@register(
    "proj_case_when",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 150000 THEN 'mid'
                ELSE 'high' END AS tier,
           count(*) AS cnt,
           (CAST(round(sum(o_totalprice) * 100, 0) AS BIGINT) // count(*)) / 100.0
             AS avg_price
    FROM orders GROUP BY 1
    """,
)
def proj_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """avg(money) uses exact integer-cents division — money averages over
    counts land exactly on half-cents where the engines' round() rules
    disagree (see win_moving_avg)."""
    tier = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    agged = (
        t(spark, sf_dir, "orders")
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    int_div = (F.col("cents") - F.col("cents") % F.col("cnt")) / F.col("cnt")
    return agged.select("tier", "cnt", (int_div / 100.0).alias("avg_price"))


@register(
    "proj_expr_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
    FROM lineitem
    """,
)
def proj_expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row arithmetic is NOT rounded: IEEE multiply on identical inputs
    is bit-identical across engines, while round() itself diverges on
    boundary values (Spark BigDecimal HALF_UP vs DuckDB scaled-double)."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
    )


@register(
    "filt_hash_sample",
    oracle="""
    WITH tagged AS (
        SELECT l_extendedprice, l_quantity,
               substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                          || CAST(l_linenumber AS VARCHAR)), 1, 2) < '0d'
                 AS in_sample
        FROM lineitem)
    SELECT CAST(count(*) AS BIGINT) AS n_total,
           CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           round(sum(CASE WHEN in_sample THEN 1 ELSE 0 END)
                 / CAST(count(*) AS DOUBLE), 6) AS sample_frac,
           round(sum(CASE WHEN in_sample THEN l_extendedprice ELSE 0 END), 2)
             AS sampled_price
    FROM tagged
    """,
)
def filt_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~5% sample via hash bucketing (first two md5 hex chars
    of the row key < '0d' = 13/256 ≈ 5.08%) — the reproducible alternative
    to sample()/TABLESAMPLE whose membership is stable across runs,
    engines, and scale-ups (the property audits and A/B slices need).
    Pure map-side expression + one global conditional aggregate: a 100 TB
    scan with no shuffle beyond the single-row agg."""
    li = t(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    tagged = li.select(
        "l_extendedprice",
        (F.substring(F.md5(key), 1, 2) < "0d").alias("in_sample"),
    )
    return tagged.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("in_sample"), 1).otherwise(0)).alias("n_sampled"),
        F.round(
            F.sum(F.when(F.col("in_sample"), 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("sample_frac"),
        F.round(
            F.sum(F.when(F.col("in_sample"), F.col("l_extendedprice")).otherwise(0.0)), 2
        ).alias("sampled_price"),
    )
