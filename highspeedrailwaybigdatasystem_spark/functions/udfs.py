"""UDF / UDAF / UDTF surface (SURVEY.md §2.10).

These are deliberately the ONLY operators that cross the JVM↔Python
boundary; everything else in the engine stays in whole-stage codegen. The
hierarchy demonstrated here, fastest first:

  pandas UDF (Arrow-batched, vectorized)  >  applyInPandas / mapInPandas
  (Arrow-batched, per-group/partition)    >  row-at-a-time Python UDF
  (udf_python_scalar — kept as the explicit slow-path example).

At 100 TB: Arrow batch size (spark.sql.execution.arrow.maxRecordsPerBatch)
and group cardinality are the knobs; a group that doesn't fit in one
executor's memory must be pre-aggregated or salted before applyInPandas.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ..registry import register
from ..operators._util import money, ratio, t


@register(
    "udf_python_scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice IS NULL THEN NULL
                WHEN o_totalprice < 50000 THEN 'budget'
                WHEN o_totalprice < 200000 THEN 'standard'
                ELSE 'premium' END AS fare_band
    FROM orders
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept for surface parity —
    the same logic as a CASE expression stays JVM-side). NULL prices band
    to NULL explicitly on BOTH sides (r15 null-injection sweep: a Python
    UDF receives None where SQL sees NULL, and `None < 50000` raises —
    while the un-annotated CASE's three-valued logic silently fell
    through to 'premium', which was equally wrong; a missing price is not
    a premium fare)."""

    @F.udf(StringType())
    def band(price: float) -> str:
        if price is None:
            return None
        if price < 50000:
            return "budget"
        if price < 200000:
            return "standard"
        return "premium"

    return t(spark, sf_dir, "orders").select(
        "o_orderkey", band("o_totalprice").alias("fare_band")
    )


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS disc_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy arithmetic).
    No rounding: the IEEE product is bit-identical to the oracle's, while
    numpy's half-even round vs DuckDB's half-away diverges on boundaries."""

    @F.pandas_udf(DoubleType())
    def disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
        return price * (1.0 - discount)

    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        disc_price("l_extendedprice", "l_discount").alias("disc_price"),
    )


@register(
    "udf_pandas_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: quantity-weighted mean price per flag."""

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(ratio(wavg("l_extendedprice", "l_quantity")).alias("wavg_price"))
    )


@register(
    "udtf_apply_in_pandas",
    oracle="""
    SELECT event_id,
           round((value - avg(value) OVER (PARTITION BY user_id))
                 / stddev_samp(value) OVER (PARTITION BY user_id), 6) AS zscore
    FROM events
    """,
)
def udtf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped grouped transform: per-user z-score of event value
    (one group in → n rows out) via applyInPandas."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)  # NaN for 1-row groups, like stddev_samp→NULL
        z = (pdf["value"] - pdf["value"].mean()) / sd
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "zscore": z.round(6)}
        ).astype({"zscore": "float64"})

    return (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "value")
        .groupBy("user_id")
        .applyInPandas(zscore, "event_id long, zscore double")
    )


@register(
    "udf_map_in_pandas",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_val
    FROM events
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-wise batch transform via mapInPandas: parse props.k with
    vectorized string extraction (the multimodal-column plumbing pattern —
    opaque payload in, typed feature out)."""

    def parse(batches):
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "event_id": pdf["event_id"],
                    "k_val": pdf["props"]
                    .str.extract(r'"k":\s*(-?\d+)')[0]
                    .astype("int64"),
                }
            )
            yield out

    return (
        t(spark, sf_dir, "events")
        .select("event_id", "props")
        .mapInPandas(parse, "event_id long, k_val long")
    )


@register(
    "pandas_api_bridge",
    oracle="""
    SELECT o_orderstatus,
           round(sum(o_totalprice), 2) AS total,
           count(*) AS cnt
    FROM orders GROUP BY o_orderstatus
    """,
)
def pandas_api_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas API on Spark: the same groupby written in pandas idiom
    (`df.pandas_api().groupby(...)`) compiles to the identical distributed
    Catalyst plan — the migration bridge for pandas-literate users; no data
    leaves the cluster."""
    psdf = t(spark, sf_dir, "orders").pandas_api()
    out = (
        psdf.groupby("o_orderstatus")
        .agg(total=("o_totalprice", "sum"), cnt=("o_orderkey", "count"))
        .reset_index()
    )
    sdf = out.to_spark()
    return sdf.select(
        "o_orderstatus",
        F.round("total", 2).alias("total"),
        F.col("cnt").cast("long").alias("cnt"),
    )


@register(
    "udaf_custom",
    oracle="""
    SELECT o_orderpriority,
           round(exp(avg(ln(o_totalprice))), 2) AS geo_mean_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def udaf_custom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom UDAF (geometric mean) as a GROUPED_AGG pandas UDF — the
    Spark-idiomatic way to define a new aggregate from Python. NULLs are
    dropped before the mean (r15 null-injection sweep): SQL aggregates
    skip NULLs, but a pandas Series carries them as NaN and NaN poisons
    np.mean — the custom-UDAF author must reimplement null-skipping by
    hand, which is exactly the trap this exhibit now documents."""

    @F.pandas_udf("double")
    def geo_mean(price: pd.Series) -> float:
        vals = price.dropna().to_numpy()
        if len(vals) == 0:
            return None
        return float(np.exp(np.log(vals).mean()))

    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(money(geo_mean("o_totalprice")).alias("geo_mean_price"))
    )


@register(
    "udtf_python",
    oracle=r"""
    SELECT doc_id,
           CAST(u.pos AS INT) AS pos,
           u.token,
           CAST(length(u.token) AS INT) AS tok_len
    FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
         (SELECT unnest(generate_series(1, len(regexp_split_to_array(d.text, ' ')))) AS pos,
                 unnest(regexp_split_to_array(d.text, ' ')) AS token) u
    WHERE length(u.token) >= 8
    """,
)
def udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Spark 4 Python UDTF (pyspark.sql.functions.udtf): a class-based
    table function LATERAL-joined per input row — one row of text in, one
    row per long token out (the UDTF analogue of posexplode+filter). This
    is the arbitrary-fan-out escape hatch for logic that genuinely can't
    be a builtin; the class ships to Python workers and yields rows per
    input. Kept off hot paths per the module hierarchy above."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string, tok_len int")
    class LongTokens:
        def eval(self, text: str):
            if text is None:
                # NULL text fans out to zero rows — the oracle's
                # regexp_split_to_array(NULL) path reaches the same end
                # (NULL series, zero unnested rows). r15 null sweep.
                return
            for i, tok in enumerate(text.split(" "), start=1):
                if len(tok) >= 8:
                    yield i, tok, len(tok)

    spark.udtf.register("long_tokens", LongTokens)
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, u.pos, u.token, u.tok_len
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 50) d,
             LATERAL long_tokens(d.text) u
        """
    )


@register(
    "udf_arrow_optimized",
    oracle="""
    SELECT p_partkey,
           concat(upper(substr(p_brand, 1, 5)), '-', CAST(p_size AS VARCHAR)) AS sku
    FROM part WHERE p_partkey <= 400
    """,
)
def udf_arrow_optimized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (Spark 3.5 useArrow=True): same row-wise
    author experience as a classic Python UDF, but inputs/outputs move as
    Arrow batches instead of pickled rows — the drop-in ~2-5× upgrade when
    a UDF can't be vectorized. Contrast with udf_python_scalar (pickled)
    and udf_pandas_scalar (fully vectorized)."""

    @F.udf(returnType=StringType(), useArrow=True)
    def make_sku(brand: str, size: int) -> str:
        return f"{brand[:5].upper()}-{size}"

    p = t(spark, sf_dir, "part").where(F.col("p_partkey") <= 400)
    return p.select("p_partkey", make_sku("p_brand", "p_size").alias("sku"))


@register(
    "udf_pandas_iterator",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice * 1.07, 2) AS taxed
    FROM orders
    """,
)
def udf_pandas_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (Iterator[pd.Series] → Iterator[pd.Series]):
    the state block before the loop runs ONCE per partition, then every
    Arrow batch streams through it — the API shape for amortizing
    expensive per-executor init (tokenizer / model / compiled regex
    loading) across batches instead of paying it per call. Here the
    "model" is a tax rate; the semantics stay oracle-exact."""
    from typing import Iterator

    def apply_tax(batches):
        rate = 1.07  # stands in for: load model/tokenizer once per partition
        for prices in batches:
            # no pandas-side .round(): numpy half-even diverges from the
            # oracle's half-away — currency rounding stays JVM-side (money())
            yield prices * rate

    # real type objects (module-wide `from __future__ import annotations`
    # would stringify inline hints, which pandas_udf cannot introspect)
    apply_tax.__annotations__ = {
        "batches": Iterator[pd.Series],
        "return": Iterator[pd.Series],
    }
    apply_tax = F.pandas_udf("double")(apply_tax)

    return t(spark, sf_dir, "orders").select(
        "o_orderkey", money(apply_tax("o_totalprice")).alias("taxed")
    )


@register(
    "udtf_analyze_polymorphic",
    oracle="""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents
                WHERE doc_id < 100)
    SELECT doc_id, t[1] AS w1, t[2] AS w2, t[3] AS w3 FROM tk
    """,
)
def udtf_analyze_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 ``analyze()`` static method): the
    OUTPUT SCHEMA is computed at plan time from the literal argument — here
    ``first_tokens(text, 3)`` resolves to columns w1..w3 before any data
    moves, the mechanism behind variable-shape table functions
    (CSV-splitters, pivots with literal column lists). The call site fixes
    n=3, so the DuckDB oracle is the equivalent fixed projection. Spark
    refuses non-literal n at analysis time — schema can't depend on data."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructField, StructType

    try:
        from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult
    except ImportError:  # pragma: no cover — API present in Spark 4.x env
        raise

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(text: "AnalyzeArgument", n: "AnalyzeArgument"):
            width = int(n.value)
            return AnalyzeResult(
                StructType(
                    [StructField(f"w{i + 1}", StringType()) for i in range(width)]
                )
            )

        def eval(self, text: str, n: int):
            if text is None:
                # preserve the input row with NULL columns, matching the
                # oracle's string_split(NULL)[i] -> NULL projection
                # (a LATERAL yielding nothing would DROP the doc row
                # instead — r15 null sweep).
                yield tuple(None for _ in range(int(n)))
                return
            toks = text.split(" ")
            yield tuple(toks[i] if i < len(toks) else None for i in range(int(n)))

    spark.udtf.register("first_tokens", FirstTokens)
    from ..schemas import ensure_views

    ensure_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT d.doc_id, u.w1, u.w2, u.w3
        FROM (SELECT doc_id, text FROM documents WHERE doc_id < 100) d,
             LATERAL first_tokens(d.text, 3) u
        """
    )


@register(
    "udf_map_in_arrow",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
             AS price_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy sibling of mapInPandas — the UDF
    receives raw ``pyarrow.RecordBatch`` objects (no pandas conversion,
    no index materialization), the right call for batch transforms whose
    logic is already Arrow-compute. Here each batch is reduced to
    per-flag partial (count, cents) pairs with pyarrow compute kernels;
    Spark's ordinary aggregate merges the partials — the same
    partial-then-merge shape a JVM aggregate has, demonstrated across
    the Arrow boundary."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partials(batches):
        for batch in batches:
            tbl = pa.table(
                {
                    "l_returnflag": batch.column(0),
                    "cents": pc.cast(
                        pc.round(
                            pc.multiply(
                                pc.cast(batch.column(1), pa.float64()), 100.0
                            )
                        ),
                        pa.int64(),
                    ),
                }
            )
            # count on the GROUP KEY, not the measure: arrow's count
            # skips nulls, so counting `cents` undercounted rows with a
            # NULL price vs the oracle's count(*) (r15 wave-2 null
            # sweep); the sum already skips nulls like SQL sum
            grouped = tbl.group_by("l_returnflag").aggregate(
                [("cents", "sum"), ("l_returnflag", "count")]
            )
            yield pa.RecordBatch.from_arrays(
                [
                    grouped["l_returnflag"].combine_chunks(),
                    grouped["l_returnflag_count"].combine_chunks(),
                    grouped["cents_sum"].combine_chunks(),
                ],
                names=["l_returnflag", "n_rows", "price_cents"],
            )

    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    part = li.mapInArrow(
        partials, "l_returnflag string, n_rows long, price_cents long"
    )
    return part.groupBy("l_returnflag").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("price_cents").alias("price_cents"),
    )


@register(
    "udf_cogrouped_apply",
    oracle="""
    WITH q AS (
      SELECT o.o_orderkey, o.o_totalprice,
             CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                  AS BIGINT) AS net_i
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderkey % 50 = 0)
    SELECT o_orderkey,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST((sum(net_i) + 50) // 100 AS DOUBLE) / 100 AS net_revenue,
           round(CAST(sum(net_i) AS DOUBLE) / 10000 / max(o_totalprice), 6)
             AS net_to_total_ratio
    FROM q GROUP BY o_orderkey ORDER BY o_orderkey
    """,
)
def udf_cogrouped_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the two-sided Arrow group API
    (df.groupBy(k).cogroup(other.groupBy(k)).applyInPandas): both sides of
    a key arrive as pandas frames in the SAME task, letting per-entity
    reconciliation logic run as plain pandas (here: lineitem net revenue
    vs order-header total). The cogroup key is a BUCKET of orders
    (orderkey-hash % 64), not the order itself: per-entity keys mean one
    Python call per entity (measured 15 s at sf0.1, 82 s at 10× — the
    classic cogroup scale-killer), while bucket grain amortizes the Arrow
    and interpreter cost over thousands of entities per call and the
    per-order math inside is a vectorized pandas groupby-merge (1.6 s /
    1.4 s at the same scales — flat at 10× — same output). Keys are
    pre-filtered
    (orderkey % 50) BEFORE the cogroup so the filter pushes to both
    parquet scans. Per-item nets quantize to a 1e-4 integer grid
    (floor(x+0.5) — round() would banker's-round in numpy but half-away
    in SQL) and cent-rounding happens in integer space, so every sum is
    exact int64 regardless of accumulation order."""

    def reconcile(orders_pdf, items_pdf):
        if orders_pdf.empty or items_pdf.empty:
            return pd.DataFrame(
                columns=["o_orderkey", "n_items", "net_revenue",
                         "net_to_total_ratio"]
            )
        # net_i stays float64 so a NULL discount flows through as NaN and
        # the sum SKIPS it like SQL's sum() does (min_count=1 keeps an
        # all-NULL group NULL instead of pandas' default 0.0); values are
        # exact integers in float64 far past any per-order magnitude, so
        # the integer-grid guarantee is unchanged. r15 null sweep: the
        # old astype("int64") raised on the first NaN.
        items = items_pdf.assign(
            net_i=np.floor(
                items_pdf["l_extendedprice"] * (1 - items_pdf["l_discount"])
                * 10000 + 0.5
            )
        )
        per_order = (
            items.groupby("l_orderkey", sort=True)
            .agg(
                n_items=("net_i", "size"),
                net_i=("net_i", lambda s: s.sum(min_count=1)),
            )
            .reset_index()
            .merge(
                orders_pdf[["o_orderkey", "o_totalprice"]],
                left_on="l_orderkey", right_on="o_orderkey",
            )
        )
        return pd.DataFrame(
            {
                "o_orderkey": per_order["o_orderkey"],
                "n_items": per_order["n_items"].astype("int64"),
                "net_revenue": ((per_order["net_i"] + 50) // 100) / 100,
                "net_to_total_ratio": (
                    per_order["net_i"] / 10000 / per_order["o_totalprice"]
                ).round(6),
            }
        )

    bucket = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(64))  # noqa: E731
    orders = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", "o_totalprice", bucket("o_orderkey").alias("b"))
    )
    items = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 50 == 0)
        .select(
            "l_orderkey", "l_extendedprice", "l_discount",
            bucket("l_orderkey").alias("b"),
        )
    )
    return (
        orders.groupBy("b")
        .cogroup(items.groupBy("b"))
        .applyInPandas(
            reconcile,
            "o_orderkey long, n_items long, net_revenue double,"
            " net_to_total_ratio double",
        )
        .orderBy("o_orderkey")
    )
