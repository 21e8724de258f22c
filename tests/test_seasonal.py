"""Seasonal dow x hour profile + seasonally-adjusted z-scores
(operators/stattests.py seasonal_*) vs a hand-rolled numpy reference."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    seasonal_anomalies,
    seasonal_cells,
    seasonal_profile,
)


def _hourly_events(counts, start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def _ref_profile(counts, start="2024-01-01 00:00:00"):
    """numpy reference: per (dow, hod) cell mean / population sd of the
    dense hourly series, dow 0 = Monday via the 2024-01-01 anchor."""
    t0 = pd.Timestamp(start)
    cells = {}
    for h, c in enumerate(counts):
        t = t0 + pd.Timedelta(hours=h)
        dow = (t.normalize() - pd.Timestamp("2024-01-01")).days % 7
        cells.setdefault((dow, t.hour), []).append(float(c))
    return {
        k: (len(v), float(np.mean(v)), float(np.std(v)))
        for k, v in cells.items()
    }


def test_dow_anchor_is_monday_zero(spark):
    # 2024-01-01 was a Monday; 2024-01-07 a Sunday
    df = spark.createDataFrame(
        pd.DataFrame(
            {"ts": [pd.Timestamp("2024-01-01 05:00"), pd.Timestamp("2024-01-07 23:30")]}
        )
    )
    rows = {r["b"]: (r["dow"], r["hod"]) for r in seasonal_cells(df, "ts").collect()}
    assert rows[pd.Timestamp("2024-01-01 05:00")] == (0, 5)
    assert rows[pd.Timestamp("2024-01-07 23:00")] == (6, 23)


def test_profile_matches_numpy(spark):
    rng = np.random.default_rng(5)
    # 3 weeks of hourly data with a planted weekly pattern + noise
    base = 10 + 5 * np.sin(np.arange(21 * 24) * 2 * np.pi / (7 * 24))
    counts = (base + rng.integers(0, 6, 21 * 24)).astype(int)
    df = spark.createDataFrame(_hourly_events(counts)).repartition(7)
    got = {
        (r["dow"], r["hod"]): (r["n_buckets"], r["mu"], r["sd"])
        for r in seasonal_profile(df, "ts").collect()
    }
    ref = _ref_profile(counts)
    assert set(got) == set(ref) and len(got) == 168
    for k, (n, mu, sd) in ref.items():
        assert got[k][0] == n
        assert got[k][1] == pytest.approx(mu, abs=2e-6)
        assert got[k][2] == pytest.approx(sd, abs=2e-6)


def test_gap_hours_count_zero_in_profile(spark):
    # two Mondays at 00: 8 events then a MISSING hour — the cell must
    # average (8, 0), not see a single observation
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ts": [pd.Timestamp("2024-01-01 00:10")] * 8
                + [pd.Timestamp("2024-01-08 00:45")] * 0
                + [pd.Timestamp("2024-01-08 01:15")]  # keeps span past wk2
            }
        )
    )
    prof = {
        (r["dow"], r["hod"]): (r["n_buckets"], r["mu"])
        for r in seasonal_profile(df, "ts").collect()
    }
    assert prof[(0, 0)] == (2, pytest.approx(4.0, abs=1e-6))


def test_anomalies_flag_planted_spike_only(spark):
    # flat 10/hour for 4 weeks except one planted 60-event spike: the
    # spike's cell is (10,10,10,60) -> z = (60-22.5)/16.238 = 2.31; the
    # sibling 10s in that cell score -0.77; every other cell sd=0 -> NULL
    counts = [10] * (28 * 24)
    spike_at = 24 * 9 + 13  # Wednesday 13:00, week 2
    counts[spike_at] = 60
    df = spark.createDataFrame(_hourly_events(counts))
    out = seasonal_anomalies(df, "ts", threshold=1.5).collect()
    assert len(out) == 1
    r = out[0]
    assert r["b"] == pd.Timestamp("2024-01-01") + pd.Timedelta(hours=spike_at)
    assert r["dow"] == 2 and r["hod"] == 13 and r["c"] == 60
    assert r["z"] == pytest.approx((60 - 22.5) / np.std([10, 10, 10, 60]), abs=2e-6)


def test_constant_series_and_empty_input(spark):
    df = spark.createDataFrame(_hourly_events([7] * 48))
    assert seasonal_anomalies(df, "ts").count() == 0  # sd=0 everywhere
    prof = seasonal_profile(df, "ts").collect()
    assert all(r["sd"] == pytest.approx(0.0, abs=1e-6) for r in prof)
    empty = df.where("ts < timestamp '2000-01-01'")
    assert seasonal_profile(empty, "ts").count() == 0
    assert seasonal_anomalies(empty, "ts").count() == 0
