"""Seasonal Mann-Kendall (operators/stattests.py seasonal_mann_kendall)
vs a sequential reference, and its power advantage under a cycle."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    mann_kendall,
    seasonal_mann_kendall,
)


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def _smk_ref(counts, start_hour=0):
    """Same definition, sequentially: per hour-of-day season S_j and
    tie-corrected Var_j over the day-over-day subseries."""
    x = np.asarray(counts, dtype=float)
    s_tot, var_tot = 0.0, 0.0
    for season in range(24):
        idx = [
            i for i in range(len(x)) if (i + start_hour) % 24 == season
        ]
        sub = x[idx]
        nj = len(sub)
        s = sum(
            np.sign(sub[j] - sub[i])
            for i in range(nj)
            for j in range(i + 1, nj)
        )
        _, cnt = np.unique(sub, return_counts=True)
        tc = float((cnt * (cnt - 1) * (2 * cnt + 5)).sum())
        s_tot += s
        var_tot += (nj * (nj - 1) * (2 * nj + 5) - tc) / 18.0
    if var_tot <= 0:
        return int(s_tot), None
    if s_tot > 0:
        z = (s_tot - 1) / math.sqrt(var_tot)
    elif s_tot < 0:
        z = (s_tot + 1) / math.sqrt(var_tot)
    else:
        z = 0.0
    return int(s_tot), round(z + 1e-9, 6)


def test_seasonal_mk_matches_reference_and_beats_plain_mk(spark):
    rng = np.random.default_rng(11)
    T = 480  # 20 days of hours
    t = np.arange(T)
    cycle = 60 + 50 * np.sin(2 * np.pi * t / 24)
    decay = cycle - 0.08 * t + rng.integers(0, 5, T)  # slow death
    flat = cycle + rng.integers(0, 5, T)
    decay = np.clip(np.round(decay), 0, None)
    flat = np.clip(np.round(flat), 0, None)
    pdf = pd.concat(
        [_hourly_events(decay, "decay"), _hourly_events(flat, "flat")]
    )
    df = spark.createDataFrame(pdf).repartition(7)
    out = {
        r["g"]: r for r in seasonal_mann_kendall(df, "g", "ts").collect()
    }
    for name, series in (("decay", decay), ("flat", flat)):
        s_ref, z_ref = _smk_ref(series)
        assert out[name]["s"] == s_ref
        assert out[name]["z"] == pytest.approx(z_ref, abs=2e-6)
    assert out["decay"]["trend"] == "decreasing"
    assert out["flat"]["trend"] == "none"
    # the power claim: under the cycle, stratification concentrates
    # the trend signal — the seasonal |z| must dominate the plain one
    plain = {r["g"]: r for r in mann_kendall(df, "g", "ts").collect()}
    assert abs(out["decay"]["z"]) > abs(plain["decay"]["z"])


def test_seasonal_mk_degenerates(spark):
    # constant series: every season constant -> Var' = 0 -> NULLs
    const = spark.createDataFrame(_hourly_events([7] * 96))
    r = seasonal_mann_kendall(const, "g", "ts").collect()[0]
    assert r["s"] == 0 and r["z"] is None and r["trend"] is None
    # shorter than one day: every season has one bucket -> no pairs
    short = spark.createDataFrame(_hourly_events([3, 9, 5, 7]))
    r2 = seasonal_mann_kendall(short, "g", "ts").collect()[0]
    assert r2["n_buckets"] == 4 and r2["s"] == 0 and r2["z"] is None
    assert seasonal_mann_kendall(
        const.where("g='x'"), "g", "ts"
    ).count() == 0
