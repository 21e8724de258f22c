"""Gini concentration and bucket-count autocorrelation
(operators/stattests.py) vs hand-rolled numpy references."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    acf_bucket_counts,
    gini_concentration,
)


def _gini_ref(weights):
    w = np.sort(np.asarray(weights, dtype=float))
    n = len(w)
    i = np.arange(1, n + 1)
    return float(2 * (i * w).sum() / (n * w.sum()) - (n + 1) / n)


def _rows(weights, group="a"):
    rows = []
    for u, w in enumerate(weights):
        rows += [{"g": group, "u": f"u{u:03d}"}] * int(w)
    return pd.DataFrame(rows)


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame(_rows([5] * 20))
    out = gini_concentration(df, "g", "u").collect()[0]
    assert out["n_units"] == 20 and out["total"] == 100
    assert out["gini"] == pytest.approx(0.0, abs=1e-6)


def test_gini_concentrated_hand_computed(spark):
    # weights (1,1,1,97): G = 2*(1+2+3+4*97)/(4*100) - 5/4 = 0.72
    df = spark.createDataFrame(_rows([1, 1, 1, 97]))
    out = gini_concentration(df, "g", "u").collect()[0]
    assert out["gini"] == pytest.approx(0.72, abs=1e-6)


def test_gini_matches_numpy_reference_per_group(spark):
    rng = np.random.default_rng(13)
    wa = rng.integers(1, 50, 40)
    wb = rng.zipf(1.7, 40).clip(1, 500)
    df = spark.createDataFrame(
        pd.concat([_rows(wa, "a"), _rows(wb, "b")])
    ).repartition(9)
    rows = {r["g"]: r for r in gini_concentration(df, "g", "u").collect()}
    assert rows["a"]["gini"] == pytest.approx(_gini_ref(wa), abs=2e-6)
    assert rows["b"]["gini"] == pytest.approx(_gini_ref(wb), abs=2e-6)
    assert rows["b"]["gini"] > rows["a"]["gini"]  # zipf is more skewed


def _acf_ref(x, k):
    x = np.asarray(x, dtype=float)
    d = x - x.mean()
    return float((d[k:] * d[:-k]).sum() / (d * d).sum())


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def test_acf_alternating_series(spark):
    # period-2 series: lag-1 strongly negative, lag-2 strongly positive
    counts = [10, 2] * 24
    df = spark.createDataFrame(_hourly_events(counts))
    out = {r["lag"]: r["acf"] for r in acf_bucket_counts(df, "g", "ts").collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    for k in out:
        assert out[k] == pytest.approx(_acf_ref(counts, k), abs=2e-6)
    assert out[1] < -0.9 and out[2] > 0.9


def test_acf_zero_fills_missing_buckets(spark):
    # hours 10..19 have NO events: the dense grid must count them as 0,
    # not skip them (a lag over observed-only rows would compare
    # non-adjacent hours)
    counts = [5] * 10 + [0] * 10 + [5] * 10
    pdf = _hourly_events(counts)
    df = spark.createDataFrame(pdf).repartition(5)
    out = {r["lag"]: r["acf"] for r in acf_bucket_counts(df, "g", "ts").collect()}
    for k in range(1, 6):
        assert out[k] == pytest.approx(_acf_ref(counts, k), abs=2e-6)


def test_acf_constant_series_is_null(spark):
    df = spark.createDataFrame(_hourly_events([7] * 30))
    out = acf_bucket_counts(df, "g", "ts").collect()
    assert len(out) == 5 and all(r["acf"] is None for r in out)
