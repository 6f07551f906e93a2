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


def test_chunking_covers_every_token(spark):
    """llm_window_chunking invariants on the real corpus: chunk count is
    ceil((n-64)/48)+1 (min 1), per-chunk token sums reconstruct
    n + 16·(n_chunks-1) (the overlap double-count), and no chunk is empty."""
    import math

    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    full = (
        entrymod.queries()["llm_window_chunking"](spark, SF_ORACLE).toPandas()
    )
    g = full.groupby(["doc_id", "n_tok"])["chunk_tokens"]
    for (doc_id, n_tok), s in g:
        expect_chunks = max(math.ceil((n_tok - 64) / 48), 0) + 1
        assert len(s) == expect_chunks, (doc_id, n_tok, len(s))
        assert (s > 0).all(), (doc_id, "empty chunk")
        # stride-48/size-64 windows double-count 16 tokens per boundary,
        # except the last (possibly short) chunk which double-counts
        # whatever of the 16-token overlap it actually contains
        if expect_chunks == 1:
            assert s.sum() == n_tok
        else:
            tail = min(n_tok - 48 * (expect_chunks - 1), 64)
            assert s.iloc[-1] == tail, (doc_id, n_tok, s.iloc[-1], tail)
            assert s.sum() == 64 * (expect_chunks - 1) + tail


def test_hash_split_is_partition(spark):
    """llm_hash_split: the three splits are disjoint and exhaustive, and
    membership is stable across invocations (pure function of doc_id)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    q = entrymod.queries()["llm_hash_split"]
    a = q(spark, SF_ORACLE).toPandas().set_index("split").sort_index()
    b = q(spark, SF_ORACLE).toPandas().set_index("split").sort_index()
    assert set(a.index) == {"train", "val", "test"}
    assert a["n_docs"].sum() == 500  # every doc in exactly one split
    pd.testing.assert_frame_equal(a, b)  # deterministic re-run


def test_weighted_median_brute_force(spark):
    """agg_weighted_median vs a driver-side brute force on the same data."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_ORACLE

    got = (
        entrymod.queries()["agg_weighted_median"](spark, SF_ORACLE)
        .toPandas()
        .set_index("l_returnflag")["weighted_median"]
    )
    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).toPandas()
    li["wt"] = (li.l_extendedprice * 100).round().astype("int64")
    for flag, grp in li.groupby("l_returnflag"):
        g = grp.sort_values("l_quantity")
        cum = g.groupby("l_quantity")["wt"].sum().cumsum()
        half = g["wt"].sum() / 2
        expect = cum[cum >= half].index[0]
        assert got[flag] == expect, (flag, got[flag], expect)
