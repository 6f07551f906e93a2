"""Scalar-function batteries (SURVEY.md §2.8): string, regex, date/time,
math, array, higher-order array, explode, JSON, map.

Everything here is a built-in ``pyspark.sql.functions`` expression — JVM-side,
inside whole-stage codegen, no Python boundary. Dialect deltas vs DuckDB are
resolved in the oracle SQL (noted per-operator): 1-based list indexing,
BIGINT year()/ceil(), dayofweek origin, string_split naming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import money, ratio, t


@register(
    "str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS up_name,
           lower(c_mktsegment) AS lo_seg,
           substr(c_name, 1, 8) AS name8,
           length(c_name) AS name_len,
           concat_ws('-', c_mktsegment, c_name) AS seg_name,
           replace(c_name, '#', '@') AS at_name,
           trim(concat(' ', c_name, ' ')) AS trimmed
    FROM customer
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("up_name"),
        F.lower("c_mktsegment").alias("lo_seg"),
        F.substring("c_name", 1, 8).alias("name8"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.replace("c_name", F.lit("#"), F.lit("@")).alias("at_name"),
        F.trim(F.concat(F.lit(" "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
    )


@register(
    "str_split_regex",
    oracle=r"""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS first_word,
           string_split(p_name, ' ')[-1] AS last_word,
           regexp_extract(p_brand, '#(\d+)', 1) AS brand_num,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
    FROM part
    """,
)
def str_split_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + regexp_extract/replace. Oracle deltas: DuckDB lists are
    1-based ([-1] = last) and regexp_replace needs the 'g' flag to match
    Spark's replace-all default."""
    p = t(spark, sf_dir, "part")
    words = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        words.getItem(0).alias("first_word"),
        F.element_at(words, -1).alias("last_word"),
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
    )


@register(
    "dt_extract",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS o_dow,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def dt_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction. Oracle deltas: DuckDB year()/month() return
    BIGINT (cast to INT), dayofweek is 0=Sunday vs Spark 1=Sunday (+1)."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@register(
    "dt_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(date_diff('day', o_orderdate, l_shipdate) AS INT) AS ship_days,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST((year(l_shipdate) - year(o_orderdate)) * 12
                + (month(l_shipdate) - month(o_orderdate)) AS INT) AS months_diff,
           CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def dt_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic across the lineitem⋈orders join (ship delay, due
    date, whole-month diff, epoch seconds)."""
    df = t(spark, sf_dir, "lineitem").join(
        t(spark, sf_dir, "orders"), F.col("l_orderkey") == F.col("o_orderkey")
    )
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.datediff("l_shipdate", "o_orderdate").alias("ship_days"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due_date"),
        (
            (F.year("l_shipdate") - F.year("o_orderdate")) * 12
            + (F.month("l_shipdate") - F.month("o_orderdate"))
        ).alias("months_diff"),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
    )


@register(
    "math_funcs",
    oracle="""
    SELECT p_partkey,
           round(p_retailprice, 1) AS r1,
           abs(p_retailprice - 1000.0) AS dist1k,
           CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
           round(sqrt(p_retailprice), 6) AS price_sqrt,
           round(pow(p_retailprice, 0.5) + ln(p_retailprice) + log10(p_retailprice), 6) AS combo,
           CAST(sign(p_retailprice - 1000.0) AS DOUBLE) AS above1k,
           greatest(p_retailprice, 1000.0) AS hi,
           least(p_retailprice, 1000.0) AS lo
    FROM part
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery. Oracle deltas: DuckDB ceil/floor return DOUBLE (cast to
    BIGINT to match Spark's LONG), sign returns numeric (cast DOUBLE).
    Transcendentals (ln/log10/pow) rounded to 6 — libm vs JVM last-ulp."""
    p = t(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price, 1).alias("r1"),
        F.abs(price - 1000.0).alias("dist1k"),
        F.ceil(price).alias("price_ceil"),
        F.floor(price).alias("price_floor"),
        ratio(F.sqrt(price)).alias("price_sqrt"),
        ratio(F.pow(price, 0.5) + F.log(price) + F.log10(price)).alias("combo"),
        F.signum(price - 1000.0).alias("above1k"),
        F.greatest(price, F.lit(1000.0)).alias("hi"),
        F.least(price, F.lit(1000.0)).alias("lo"),
    )


@register(
    "arr_basic",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           round(CAST(embedding[-1] AS DOUBLE), 6) AS last_elem,
           list_transform(embedding[1:3], x -> round(CAST(x AS DOUBLE), 6)) AS head3
    FROM embeddings
    """,
)
def arr_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array basics over the embedding column. Oracle deltas: DuckDB len()
    is BIGINT; DuckDB list slicing [1:3] ≡ Spark slice(arr, 1, 3)."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_elem"),
        F.round(F.element_at(emb, -1).cast("double"), 6).alias("last_elem"),
        F.transform(
            F.slice(emb, 1, 3), lambda x: F.round(x.cast("double"), 6)
        ).alias("head3"),
    )


@register(
    "arr_higher_order",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_aggregate(
                 list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                 'sum')), 6) AS l2_norm,
           round(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                'sum'), 6) AS elem_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS pos_cnt
    FROM embeddings
    """,
)
def arr_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order lambdas: aggregate (fold), transform, filter. Floats are
    cast to double INSIDE the lambda so both engines square in float64
    (float32 squaring would diverge)."""
    e = t(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sq_sum = F.aggregate(
        emb,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    el_sum = F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        ratio(F.sqrt(sq_sum)).alias("l2_norm"),
        ratio(el_sum).alias("elem_sum"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("pos_cnt"),
    )


@register(
    "arr_explode",
    oracle="""
    SELECT token, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) x
    GROUP BY token
    ORDER BY cnt DESC, token
    LIMIT 50
    """,
)
def arr_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize + explode + count: the scan→explode→agg shape every text
    pipeline uses. Deterministic cut: (cnt DESC, token)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token"))
        .limit(50)
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_sum,
           round(avg(CAST(props->>'$.k' AS INT)), 6) AS k_avg,
           count(*) AS cnt
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (props = '{"k": <int>}') + aggregation."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        ratio(F.avg(k)).alias("k_avg"),
        F.count(F.lit(1)).alias("cnt"),
    )


@register(
    "map_ops",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, count(*) AS cnt
      FROM events GROUP BY user_id, event_type)
    SELECT user_id,
           list(event_type ORDER BY event_type) AS type_keys,
           list(cnt ORDER BY event_type) AS type_counts
    FROM per_type GROUP BY user_id
    """,
)
def map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build map<event_type → count> per user, read it back as sorted
    key/value arrays (MAP iteration order is engine-specific, so the output
    contract is sorted arrays — SURVEY.md §2.8 map_ops)."""
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    with_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    keys = F.array_sort(F.map_keys(F.col("m")))
    return with_map.select(
        "user_id",
        keys.alias("type_keys"),
        F.transform(keys, lambda k: F.element_at(F.col("m"), k)).alias("type_counts"),
    )
