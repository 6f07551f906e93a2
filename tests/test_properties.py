"""Property-based metamorphic checks (SURVEY.md §5.2 #3): random small
frames, engine-vs-engine and algebraic invariants. Few examples per
property — each example pays a Spark job's fixed cost."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=64),
        st.sampled_from(["alpha", "Beta", "GAMMA", "", "x y", "Ab#3"]),
    ),
    min_size=1,
    max_size=50,
)

_SETTINGS = dict(max_examples=10, deadline=None)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v double, s string")


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_filter_composition(spark, rows):
    from pyspark.sql import functions as F

    df = _df(spark, rows)
    a, b = F.col("k") > 0, F.col("v") < 100.0
    assert df.where(a).where(b).count() == df.where(a & b).count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_union_and_distinct_counts(spark, rows):
    df = _df(spark, rows)
    n = df.count()
    assert df.unionAll(df).count() == 2 * n
    assert df.distinct().count() == len({tuple(r) for r in rows})


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_join_row_bounds(spark, rows):
    df = _df(spark, rows)
    n = df.count()
    joined = df.alias("a").join(df.alias("b"), "k")
    # inner self-join on a key: at least the matching rows, at most n²
    assert n <= joined.count() + df.where("k is null").count() <= n * n


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_scalar_functions_match_duckdb(spark, rows):
    """upper/substr/length/abs on generated values: Spark ≡ DuckDB."""
    from pyspark.sql import functions as F

    sp = (
        _df(spark, rows)
        .select(
            F.upper("s").alias("u"),
            F.substring("s", 1, 2).alias("s2"),
            F.length("s").alias("ln"),
            F.abs("k").alias("ak"),
        )
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    con = duckdb.connect()
    con.register("t", pdf)
    du = con.execute(
        "SELECT upper(s) AS u, substr(s,1,2) AS s2,"
        " CAST(length(s) AS INT) AS ln, abs(k) AS ak FROM t"
    ).fetchdf()
    con.close()
    key = lambda d: sorted(map(tuple, d.itertuples(index=False)))
    assert key(sp) == key(du)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_window_rownum_matches_duckdb(spark, rows):
    """row_number with a total order (full tie-break) ≡ DuckDB."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("s").orderBy("k", "v")
    sp = (
        _df(spark, rows)
        .select("k", "v", "s", F.row_number().over(w).alias("rn"))
        .toPandas()
    )
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    con = duckdb.connect()
    con.register("t", pdf)
    du = con.execute(
        "SELECT k, v, s, CAST(row_number() OVER"
        " (PARTITION BY s ORDER BY k, v) AS INT) AS rn FROM t"
    ).fetchdf()
    con.close()
    key = lambda d: sorted(map(tuple, d.itertuples(index=False)))
    assert key(sp) == key(du)


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_outer_join_null_semantics(spark, rows):
    """Left join: every left row survives exactly once per match (or once
    with NULLs); total = inner count + unmatched count."""
    from pyspark.sql import functions as F

    df = _df(spark, rows)
    right = df.where("k % 2 = 0").select(F.col("k").alias("rk")).distinct()
    left_join = df.join(right, df.k == right.rk, "left")
    inner = df.join(right, df.k == right.rk).count()
    unmatched = left_join.where("rk IS NULL").count()
    assert left_join.count() == inner + unmatched
    assert unmatched == df.where("k % 2 != 0 OR k IS NULL").count()


@given(rows=ROWS)
@settings(**_SETTINGS)
def test_groupby_sum_matches_duckdb(spark, rows):
    """Integer-exact aggregate: Spark group sums ≡ DuckDB group sums."""
    sp = _df(spark, rows).groupBy("s").sum("k").toPandas()
    pdf = pd.DataFrame(rows, columns=["k", "v", "s"])
    con = duckdb.connect()
    con.register("t", pdf)
    du = con.execute(
        "SELECT s, CAST(sum(k) AS BIGINT) AS sk FROM t GROUP BY s"
    ).fetchdf()
    con.close()
    sp.columns = ["s", "sk"]
    key = lambda d: sorted(map(tuple, d.itertuples(index=False)))
    assert key(sp) == key(du)
