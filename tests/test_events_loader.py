"""Events loader unit coverage: the footer sniff must classify µs- and
ns-encoded events files correctly and both branches must yield IDENTICAL
µs timestamps — the regression the round-2 corpus regeneration exposed
(ns conversion applied to µs data → every timestamp 1000× too small).

The live corpus is timestamp[us] only, so the legacy int64-ns path has no
on-disk fixture anymore; this test synthesizes one with pyarrow so the
branch stays exercised.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from highspeedrailwaybigdatasystem_spark.schemas import (
    _sniff_events_ts_kind,
    load,
)
from highspeedrailwaybigdatasystem_spark.sources._scratch import scratch_dir

_TS = [
    dt.datetime(2024, 1, 2, 13, 33, 7, 222762),
    dt.datetime(2024, 1, 15, 0, 0, 0, 0),
    dt.datetime(2024, 1, 29, 23, 59, 59, 999999),
]


def _write_events(sf_dir: str, unit: str) -> None:
    os.makedirs(sf_dir, exist_ok=True)
    n = len(_TS)
    cols = {
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(_TS, pa.timestamp(unit)),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([1.5] * n, pa.float64()),
        "props": pa.array(['{"k": 1}'] * n, pa.string()),
    }
    pq.write_table(pa.table(cols), f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def two_unit_dirs():
    base = scratch_dir("events_loader_units")
    shutil.rmtree(base, ignore_errors=True)
    us_dir, ns_dir = f"{base}/us_sf", f"{base}/ns_sf"
    _write_events(us_dir, "us")
    _write_events(ns_dir, "ns")
    yield us_dir, ns_dir
    shutil.rmtree(base, ignore_errors=True)


def test_sniffer_classifies_both_units(two_unit_dirs):
    us_dir, ns_dir = two_unit_dirs
    assert _sniff_events_ts_kind(f"{us_dir}/events.parquet") == "us"
    assert _sniff_events_ts_kind(f"{ns_dir}/events.parquet") == "ns"


def test_both_branches_yield_identical_timestamps(spark, two_unit_dirs):
    us_dir, ns_dir = two_unit_dirs
    got_us = sorted(r["ts"] for r in load(spark, us_dir, "events").collect())
    got_ns = sorted(r["ts"] for r in load(spark, ns_dir, "events").collect())
    assert got_us == sorted(_TS), "native µs read must be lossless"
    assert got_ns == sorted(_TS), (
        "legacy ns branch must div-1000 back to the same µs instants"
    )


def test_out_of_range_corpus_refuses_to_load(spark):
    """A corpus whose ts statistics fall outside the documented window
    (here: 1970 epoch-adjacent — exactly what a unit mixup produces) must
    be rejected at sniff time, not silently mis-read."""
    bad_dir = scratch_dir("events_loader_bad")
    shutil.rmtree(bad_dir, ignore_errors=True)
    os.makedirs(bad_dir)
    n = 2
    cols = {
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(
            [dt.datetime(1970, 1, 20, 17, 23), dt.datetime(1970, 1, 21)],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([1] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([0.5] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    }
    pq.write_table(pa.table(cols), f"{bad_dir}/events.parquet")
    with pytest.raises(ValueError, match="out of documented corpus range"):
        load(spark, bad_dir, "events")
    shutil.rmtree(bad_dir, ignore_errors=True)
