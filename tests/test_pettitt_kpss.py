"""Pettitt change-point (operators/stattests.py pettitt_changepoint)
vs the O(n^2) double-loop definition, and KPSS level-stationarity
(kpss_level) vs a sequential numpy reference."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    kpss_level,
    pettitt_changepoint,
)


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def _pettitt_ref(counts):
    """Textbook double loop: U_t = sum_{i<=t} sum_{j>t} sign(x_i-x_j)."""
    x = np.asarray(counts, dtype=float)
    n = len(x)
    u = np.array(
        [
            sum(
                np.sign(x[i] - x[j])
                for i in range(t + 1)
                for j in range(t + 1, n)
            )
            for t in range(n - 1)
        ]
    )
    if len(u) == 0 or np.abs(u).max() == 0:
        return 0, None, 1.0
    k = int(np.abs(u).max())
    cp = int(np.abs(u).argmax())  # earliest, 0-based hour index
    p = min(1.0, 2.0 * math.exp(-6.0 * k * k / (n**3 + n**2)))
    return k, cp, round(p + 1e-9, 6)


def test_pettitt_matches_double_loop_and_finds_shift(spark):
    rng = np.random.default_rng(5)
    shifted = np.concatenate(
        [rng.integers(20, 30, 60), rng.integers(45, 55, 60)]
    )
    flat = rng.integers(20, 30, 120)
    pdf = pd.concat(
        [_hourly_events(shifted, "shift"), _hourly_events(flat, "flat")]
    )
    df = spark.createDataFrame(pdf).repartition(5)
    out = {
        r["g"]: r for r in pettitt_changepoint(df, "g", "ts").collect()
    }
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    for name, series in (("shift", shifted), ("flat", flat)):
        k_ref, cp_ref, p_ref = _pettitt_ref(series)
        r = out[name]
        assert r["k_stat"] == k_ref
        assert r["p_approx"] == pytest.approx(p_ref, abs=2e-6)
        if cp_ref is not None:
            assert r["cp_bucket"] == (t0 + pd.Timedelta(hours=cp_ref))
    assert out["shift"]["shift_detected"] is True
    # the planted break is at hour 60; the argmax must land near it
    cp_hour = (out["shift"]["cp_bucket"] - t0).total_seconds() / 3600
    assert 55 <= cp_hour <= 64
    assert out["flat"]["shift_detected"] is False


def test_pettitt_degenerates(spark):
    const = spark.createDataFrame(_hourly_events([7] * 50))
    r = pettitt_changepoint(const, "g", "ts").collect()[0]
    assert r["k_stat"] == 0 and r["cp_bucket"] is None
    assert r["p_approx"] == 1.0 and r["shift_detected"] is False
    single = spark.createDataFrame(_hourly_events([3]))
    r2 = pettitt_changepoint(single, "g", "ts").collect()[0]
    assert r2["n_buckets"] == 1 and r2["k_stat"] == 0
    assert r2["cp_bucket"] is None and r2["p_approx"] == 1.0


def _kpss_ref(counts, max_lag=12):
    """Sequential KPSS (level): Bartlett long-run variance at
    l = floor(4 (n/100)^0.25) clamped to [0, min(max_lag, n-1)]."""
    x = np.asarray(counts, dtype=float)
    n = len(x)
    e = x - x.mean()
    s = np.cumsum(e)
    num = float((s * s).sum())
    lag = min(
        int(math.floor(4.0 * (n / 100.0) ** 0.25 + 1e-9)), max_lag, n - 1
    )
    g0 = float((e * e).sum()) / n
    s2 = g0
    for j in range(1, lag + 1):
        gj = float((e[j:] * e[:-j]).sum()) / n
        s2 += 2.0 * (1.0 - j / (lag + 1.0)) * gj
    if s2 <= 0:
        return lag, None, None
    eta = num / (n * n * s2)
    return lag, round(eta + 1e-9, 6), bool(eta > 0.463)


def test_kpss_matches_reference_and_verdicts(spark):
    rng = np.random.default_rng(9)
    trend = np.round(30 + 0.5 * np.arange(200) + rng.normal(0, 2, 200))
    level = np.round(30 + rng.normal(0, 2, 200))
    trend = np.clip(trend, 0, None)
    level = np.clip(level, 0, None)
    pdf = pd.concat(
        [_hourly_events(trend, "trend"), _hourly_events(level, "level")]
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = {r["g"]: r for r in kpss_level(df, "g", "ts").collect()}
    for name, series in (("trend", trend), ("level", level)):
        lag_ref, eta_ref, rej_ref = _kpss_ref(series)
        r = out[name]
        assert r["lag_l"] == lag_ref
        assert r["kpss_stat"] == pytest.approx(eta_ref, abs=2e-6)
        assert r["kpss_reject"] is rej_ref
    assert out["trend"]["kpss_reject"] is True
    assert out["level"]["kpss_reject"] is False


def test_kpss_degenerates(spark):
    const = spark.createDataFrame(_hourly_events([4] * 40))
    r = kpss_level(const, "g", "ts").collect()[0]
    assert r["kpss_stat"] is None and r["kpss_reject"] is None
    # short series: lag clamps to n-1
    short = spark.createDataFrame(_hourly_events([3, 9]))
    r2 = kpss_level(short, "g", "ts").collect()[0]
    assert r2["n_buckets"] == 2 and r2["lag_l"] <= 1
