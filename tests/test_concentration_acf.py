"""Gini concentration, bucket-count autocorrelation, and Durbin-Levinson
PACF (operators/stattests.py) vs hand-rolled numpy references."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    acf_bucket_counts,
    gini_concentration,
    pacf_durbin_levinson,
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


def _pacf_ref(x, K=5):
    """Durbin-Levinson on the 6-dp-rounded biased ACF — the operator's
    exact contract (both engines round r_k before the recursion)."""
    R = {k: float(np.round(_acf_ref(x, k) + 1e-9, 6)) for k in range(1, K + 1)}
    phi = {1: {1: R[1]}}
    v = 1.0 - R[1] ** 2
    out = {1: R[1]}
    for k in range(2, K + 1):
        num = R[k] - sum(phi[k - 1][j] * R[k - j] for j in range(1, k))
        pkk = num / v
        phi[k] = {
            j: phi[k - 1][j] - pkk * phi[k - 1][k - j] for j in range(1, k)
        }
        phi[k][k] = pkk
        v = v * (1.0 - pkk**2)
        out[k] = pkk
    return out


def test_pacf_matches_numpy_reference(spark):
    # a bumpy but non-degenerate hourly series, two groups with
    # different shapes, shattered across partitions
    rng = np.random.default_rng(7)
    ca = rng.integers(1, 30, 48)
    cb = (10 + 8 * np.sin(np.arange(48) * 2 * np.pi / 12)).astype(int)
    pdf = pd.concat([_hourly_events(ca, "a"), _hourly_events(cb, "b")])
    df = spark.createDataFrame(pdf).repartition(7)
    rows = pacf_durbin_levinson(df, "g", "ts").collect()
    got = {(r["g"], r["lag"]): r["pacf"] for r in rows}
    assert len(got) == 10
    refa, refb = _pacf_ref(ca), _pacf_ref(cb)
    for k in range(1, 6):
        assert got[("a", k)] == pytest.approx(refa[k], abs=2e-6)
        assert got[("b", k)] == pytest.approx(refb[k], abs=2e-6)


def test_pacf_ar1_cuts_off_after_lag_one(spark):
    # AR(1) count series: ACF decays geometrically at every lag, PACF
    # is large at lag 1 and ~0 beyond — the property the operator exists
    # to expose (raw ACF cannot identify the AR order)
    rng = np.random.default_rng(11)
    x, counts = 20.0, []
    for _ in range(200):
        x = 20 + 0.8 * (x - 20) + rng.normal(0, 3)
        counts.append(max(0, int(round(x))))
    df = spark.createDataFrame(_hourly_events(counts))
    out = {r["lag"]: r["pacf"] for r in pacf_durbin_levinson(df, "g", "ts").collect()}
    acf = {r["lag"]: r["acf"] for r in acf_bucket_counts(df, "g", "ts").collect()}
    assert out[1] > 0.6
    for k in (2, 3, 4, 5):
        assert abs(out[k]) < 0.25
    # the contrast: raw ACF at lag 3 is still large where PACF is ~0
    assert acf[3] > 0.3 and abs(out[3]) < 0.25


def test_pacf_lag1_equals_acf_lag1(spark):
    counts = [10, 2] * 24
    df = spark.createDataFrame(_hourly_events(counts))
    acf1 = {r["lag"]: r["acf"] for r in acf_bucket_counts(df, "g", "ts").collect()}[1]
    pacf1 = {r["lag"]: r["pacf"] for r in pacf_durbin_levinson(df, "g", "ts").collect()}[1]
    assert pacf1 == pytest.approx(acf1, abs=2e-6)


def test_pacf_constant_series_null_and_empty_input(spark):
    df = spark.createDataFrame(_hourly_events([7] * 30))
    out = pacf_durbin_levinson(df, "g", "ts").collect()
    assert len(out) == 5 and all(r["pacf"] is None for r in out)
    empty = pacf_durbin_levinson(df.where("g = 'nope'"), "g", "ts")
    assert empty.count() == 0
