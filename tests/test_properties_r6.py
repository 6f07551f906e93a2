"""Property checks for the round-6 late additions: logistic-GD weight-sign
and boundedness, FCM mass/centroid algebra, boosting error monotonicity,
cross-correlation of a planted lead-lag signal, LPA determinism — all on
synthetic corpora written to a throwaway sf_dir so the REGISTERED ops run
unchanged (same sql_q path and memoized-view machinery the driver uses)."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from hypothesis import given, settings, strategies as st

from highspeedrailwaybigdatasystem_spark.registry import all_queries
from highspeedrailwaybigdatasystem_spark.schemas import TABLE_NAMES

SF_SMOKE = "/root/testdata/sf0.001"

_SETTINGS = dict(max_examples=5, deadline=None)


def _synthetic_sf(**overrides: pd.DataFrame) -> str:
    d = tempfile.mkdtemp(prefix="prop_sf6_")
    for name in TABLE_NAMES:
        dst = os.path.join(d, f"{name}.parquet")
        if name in overrides:
            overrides[name].to_parquet(dst, index=False)
        else:
            os.symlink(f"{SF_SMOKE}/{name}.parquet", dst)
    return d


def _orders(rows) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "o_orderkey": range(1, len(rows) + 1),
            "o_custkey": [i % 13 + 1 for i in range(len(rows))],
            "o_orderstatus": [s for s, _ in rows],
            "o_totalprice": [p for _, p in rows],
            "o_orderdate": pd.Series(
                [pd.Timestamp("2024-01-10")] * len(rows), dtype="datetime64[us]"
            ),
            "o_orderpriority": ["3-MEDIUM"] * len(rows),
        }
    )


# --- ml_logistic_gd_steps ----------------------------------------------------

SEP = st.lists(
    st.tuples(st.booleans(), st.floats(min_value=1_000.0, max_value=40_000.0,
                                       allow_nan=False, width=64)),
    min_size=20,
    max_size=100,
)


@given(rows=SEP)
@settings(**_SETTINGS)
def test_logistic_gd_weight_sign_and_bound(spark, rows):
    """On a perfectly separated corpus (every 'F' order is high-value,
    every other is low-value) the value weight w1 must end positive and
    grow monotonically; both weights stay inside the |lr|·steps bound the
    quantized update implies (|mean gradient| ≤ 1 per step)."""
    data = [("F", 450_000.0 + p) if f else ("O", p) for f, p in rows]
    # ensure both classes exist
    data += [("F", 480_000.0), ("O", 2_000.0)]
    sf = _synthetic_sf(orders=_orders(data))
    out = (
        all_queries()["ml_logistic_gd_steps"](spark, sf)
        .toPandas()
        .sort_values("step")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    w1 = out["w1"].tolist()
    assert w1[-1] > 0
    assert all(b >= a - 1e-9 for a, b in zip(w1, w1[1:]))
    assert all(abs(w) <= 4.0 * 3 + 1e-6 for w in out["w0"].tolist() + w1)


# --- ml_fuzzy_cmeans_step ----------------------------------------------------

LOWVALS = st.lists(
    st.floats(min_value=15_000.0, max_value=25_000.0, allow_nan=False,
              width=64),
    min_size=15,
    max_size=80,
)


@given(vals=LOWVALS)
@settings(**_SETTINGS)
def test_fcm_mass_closure_and_centroid_range(spark, vals):
    """Membership mass shares sum to 1 (within rounding grain); every
    centroid that received mass lies inside the observed data range
    widened by the kilocent quantization (zero-mass clusters keep their
    init centroid — the FCM empty-cluster rule); the cluster whose init
    centroid is nearest the (tight) data mass takes the dominant share."""
    sf = _synthetic_sf(orders=_orders([("O", v) for v in vals]))
    out = all_queries()["ml_fuzzy_cmeans_step"](spark, sf).toPandas()
    assert len(out) == 3
    assert abs(out["mass_share"].sum() - 1.0) < 1e-4
    lo, hi = min(vals), max(vals)
    for _, r in out.iterrows():
        if r["mass_share"] > 0:
            assert lo - 20.0 <= r["centroid_dollars"] <= hi + 20.0
    # init centroids are $20k/$150k/$350k; data sits at $15–25k → cid 1
    dominant = out.sort_values("mass_share").iloc[-1]["cid"]
    assert dominant == 1


# --- ml_boosted_stumps_2round ------------------------------------------------

LINES = st.lists(
    st.tuples(st.integers(min_value=1, max_value=50),
              st.floats(min_value=1_000.0, max_value=90_000.0,
                        allow_nan=False, width=64)),
    min_size=30,
    max_size=120,
)


@given(rows=LINES)
@settings(**_SETTINGS)
def test_boosting_reduces_training_sse(spark, rows):
    """Round-2 SSE (on residuals, after its own best split) never exceeds
    round-1 SSE: each boosting round weakly reduces training error. Both
    rounds must pick a threshold from the 9-point grid, and round-1 leaf
    predictions stay inside the target range."""
    # both sides of every candidate threshold need rows
    rows = rows + [(1, 5_000.0), (50, 80_000.0)]
    li = pd.DataFrame(
        {
            "l_orderkey": range(1, len(rows) + 1),
            "l_partkey": [i % 7 + 1 for i in range(len(rows))],
            "l_suppkey": [i % 3 + 1 for i in range(len(rows))],
            "l_linenumber": [1] * len(rows),
            "l_quantity": [float(q) for q, _ in rows],
            "l_extendedprice": [p for _, p in rows],
            "l_discount": [0.0] * len(rows),
            "l_tax": [0.0] * len(rows),
            "l_returnflag": ["N"] * len(rows),
            "l_linestatus": ["O"] * len(rows),
            "l_shipdate": pd.Series(
                [pd.Timestamp("2024-01-12")] * len(rows), dtype="datetime64[us]"
            ),
        }
    )
    sf = _synthetic_sf(lineitem=li)
    out = (
        all_queries()["ml_boosted_stumps_2round"](spark, sf)
        .toPandas()
        .sort_values("round")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out["sse"].iloc[1] <= out["sse"].iloc[0] + 1e-6
    assert set(out["threshold"]) <= {5, 10, 15, 20, 25, 30, 35, 40, 45}
    prices = [p for _, p in rows]
    assert min(prices) - 200 <= out["pred_left_dollars"].iloc[0] <= max(prices)
    assert min(prices) - 200 <= out["pred_right_dollars"].iloc[0] <= max(prices)


# --- ts_cross_correlation ----------------------------------------------------

@given(seed=st.integers(min_value=0, max_value=10_000))
@settings(**_SETTINGS)
def test_xcorr_detects_planted_one_day_lead(spark, seed):
    """Clicks on day d are exactly mirrored by purchases on day d+1 (count
    pattern planted from the seed): the lag-1 correlation must be maximal
    and ≈1; every reported correlation lies in [-1, 1]."""
    days = pd.date_range("2024-01-02", periods=12, freq="D")
    counts = [((seed >> i) % 7) + 2 + (3 if i % 4 == 0 else 0)
              for i in range(len(days))]
    rows = []
    eid = 0
    for d, c in zip(days, counts):
        for _ in range(c):
            rows.append((eid, d + pd.Timedelta(hours=9), "click"))
            eid += 1
            rows.append((eid, d + pd.Timedelta(days=1, hours=15), "purchase"))
            eid += 1
    ev = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": pd.Series([r[1] for r in rows], dtype="datetime64[us]"),
            "user_id": [r[0] % 9 for r in rows],
            "event_type": [r[2] for r in rows],
            "value": [1.0] * len(rows),
            "props": ["{}"] * len(rows),
        }
    )
    sf = _synthetic_sf(events=ev)
    out = (
        all_queries()["ts_cross_correlation"](spark, sf)
        .toPandas()
        .set_index("lag")
    )
    assert (out["xcorr"].abs() <= 1.0 + 1e-9).all()
    # constant series → NULL corr is possible only for the planted
    # constant-free pattern; lag 1 must exist and dominate
    x1 = out.loc[1, "xcorr"]
    assert x1 > 0.99
    for lag in (0, 2, 3):
        if lag in out.index and pd.notna(out.loc[lag, "xcorr"]):
            assert out.loc[lag, "xcorr"] <= x1 + 1e-9


# --- graph_label_propagation -------------------------------------------------

def test_lpa_deterministic_and_closed(spark):
    """Two runs produce identical community tables; sizes are positive and
    their sum is bounded by the vertex count."""
    q = all_queries()["graph_label_propagation"]
    a = q(spark, SF_SMOKE).toPandas()
    b = q(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(a, b)
    assert (a["community_size"] > 0).all()
    import duckdb

    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()[0]
    assert a["community_size"].sum() <= n_users
