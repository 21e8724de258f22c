"""Dominant-period detection via the discrete periodogram
(operators/stattests.py dominant_period) vs a numpy reference."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import dominant_period


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def _ref(counts, max_k=8):
    """Same math, sequentially: mean-centered DFT power at k=1..max_k
    restricted below Nyquist, argmax on 6-dp-rounded power with
    smallest-k tie-break."""
    x = np.asarray(counts, dtype=float)
    T = len(x)
    d = x - x.mean()
    ss = float((d * d).sum())
    t = np.arange(T, dtype=float)
    cands = []
    for k in range(1, max_k + 1):
        if ss <= 0 or k > (T - 1) // 2:
            continue
        a = float((d * np.cos(t * (2.0 * math.pi * k) / T)).sum())
        b = float((d * np.sin(t * (2.0 * math.pi * k) / T)).sum())
        pw = (a * a + b * b) * 2.0 / T
        cands.append((round(pw + 1e-9, 6), -k, k, pw))
    if not cands:
        return None
    _, _, k, pw = max(cands)
    return {
        "best_k": k,
        "period_buckets": round(T / k + 1e-9, 6),
        "power": round(pw + 1e-9, 6),
        "power_frac": round(pw / ss + 1e-9, 6),
    }


def test_periodogram_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    T = 240
    t = np.arange(T)
    # strong 24 h cycle + noise; strong 12 h cycle + noise
    daily = 50 + 30 * np.sin(2 * np.pi * t / 24) + rng.integers(0, 9, T)
    half = 40 + 25 * np.cos(2 * np.pi * t / 12) + rng.integers(0, 9, T)
    daily = np.clip(np.round(daily), 0, None)
    half = np.clip(np.round(half), 0, None)
    pdf = pd.concat(
        [_hourly_events(daily, "daily"), _hourly_events(half, "half")]
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = {r["g"]: r for r in dominant_period(df, "g", "ts").collect()}
    for name, series in (("daily", daily), ("half", half)):
        ref = _ref(series)
        row = out[name]
        assert row["n_buckets"] == len(series)
        assert row["best_k"] == ref["best_k"]
        assert row["period_buckets"] == pytest.approx(
            ref["period_buckets"], abs=2e-6
        )
        assert row["power"] == pytest.approx(ref["power"], rel=1e-6)
        assert row["power_frac"] == pytest.approx(
            ref["power_frac"], abs=2e-6
        )
    # T=240 hours of a 24 h cycle -> harmonic k = 240/24 = 10 exceeds
    # max_k=8, so "daily" locks onto nothing above noise unless we
    # widen max_k; verify the wide call finds it exactly
    wide = {
        r["g"]: r
        for r in dominant_period(df, "g", "ts", max_k=24).collect()
    }
    assert wide["daily"]["best_k"] == 10  # period 240/10 = 24 h
    assert wide["daily"]["period_buckets"] == pytest.approx(24.0)
    assert wide["half"]["best_k"] == 20  # period 240/20 = 12 h
    assert wide["half"]["power_frac"] > 0.8


def test_periodogram_parseval_full_coverage(spark):
    # odd T with max_k = (T-1)/2 covers every sub-Nyquist harmonic, so
    # the powers must sum exactly to the deviation energy (Parseval)
    rng = np.random.default_rng(3)
    series = rng.integers(1, 40, 33)
    df = spark.createDataFrame(_hourly_events(series))
    row = dominant_period(df, "g", "ts", max_k=16).collect()[0]
    ref = _ref(series, max_k=16)
    assert row["best_k"] == ref["best_k"]
    d = series - series.mean()
    ss = float((d * d).sum())
    t = np.arange(33, dtype=float)
    total = sum(
        (
            float((d * np.cos(t * 2 * math.pi * k / 33)).sum()) ** 2
            + float((d * np.sin(t * 2 * math.pi * k / 33)).sum()) ** 2
        )
        * 2.0
        / 33
        for k in range(1, 17)
    )
    assert total == pytest.approx(ss, rel=1e-9)
    assert 0 < row["power_frac"] <= 1


def test_periodogram_constant_short_empty(spark):
    const = spark.createDataFrame(_hourly_events([7] * 64))
    rows = dominant_period(const, "g", "ts").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_buckets"] == 64 and r["best_k"] is None
    assert r["power"] is None and r["power_frac"] is None
    # T=2: no k satisfies k <= floor((T-1)/2) -> NULLs, group kept
    short = spark.createDataFrame(_hourly_events([3, 9]))
    r2 = dominant_period(short, "g", "ts").collect()[0]
    assert r2["n_buckets"] == 2 and r2["best_k"] is None
    empty = dominant_period(const.where("g = 'nope'"), "g", "ts")
    assert empty.count() == 0
