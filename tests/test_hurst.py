"""Hurst exponent via rescaled-range analysis
(operators/stattests.py hurst_rescaled_range) vs a numpy reference."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import hurst_rescaled_range

SCALES = (8, 16, 32, 64)


def _hourly_events(counts, group="a", start="2024-01-01 00:00:00"):
    t0 = pd.Timestamp(start)
    rows = []
    for h, c in enumerate(counts):
        rows += [{"g": group, "ts": t0 + pd.Timedelta(hours=h)}] * int(c)
    return pd.DataFrame(rows)


def _hurst_ref(counts, scales=SCALES):
    """Same algorithm, sequentially: complete windows only, zero-variance
    windows excluded, mean R/S per scale, log-log least-squares slope."""
    x = np.asarray(counts, dtype=float)
    pts = []
    for n in scales:
        rss = []
        for w in range(len(x) // n):
            seg = x[w * n : (w + 1) * n]
            cum = np.cumsum(seg - seg.mean())
            s = seg.std()
            if s > 0:
                rss.append((cum.max() - cum.min()) / s)
        if rss and np.mean(rss) > 0:
            pts.append((np.log(n), np.log(np.mean(rss))))
    lx = np.array([p[0] for p in pts])
    ly = np.array([p[1] for p in pts])
    k = len(pts)
    return float(
        (k * (lx * ly).sum() - lx.sum() * ly.sum())
        / (k * (lx * lx).sum() - lx.sum() ** 2)
    )


def test_hurst_matches_numpy_reference_two_groups(spark):
    rng = np.random.default_rng(17)
    iid = rng.integers(5, 30, 512)
    walk = np.clip(50 + np.cumsum(rng.integers(-3, 4, 512)), 0, None)
    pdf = pd.concat(
        [_hourly_events(iid, "iid"), _hourly_events(walk, "walk")]
    )
    df = spark.createDataFrame(pdf).repartition(9)
    out = {
        r["g"]: r for r in hurst_rescaled_range(df, "g", "ts").collect()
    }
    assert out["iid"]["n_scales"] == 4 and out["walk"]["n_scales"] == 4
    assert out["iid"]["hurst"] == pytest.approx(_hurst_ref(iid), abs=2e-6)
    assert out["walk"]["hurst"] == pytest.approx(_hurst_ref(walk), abs=2e-6)


def test_hurst_separates_persistence_regimes(spark):
    rng = np.random.default_rng(23)
    iid = rng.integers(5, 30, 512)
    walk = np.clip(50 + np.cumsum(rng.integers(-3, 4, 512)), 0, None)
    anti = np.array([10, 2] * 256)  # strictly alternating: anti-persistent
    pdf = pd.concat(
        [
            _hourly_events(iid, "iid"),
            _hourly_events(walk, "walk"),
            _hourly_events(anti, "anti"),
        ]
    )
    out = {
        r["g"]: r["hurst"]
        for r in hurst_rescaled_range(
            spark.createDataFrame(pdf), "g", "ts"
        ).collect()
    }
    assert 0.35 < out["iid"] < 0.75
    assert out["walk"] > 0.8
    assert out["anti"] < 0.3
    assert out["anti"] < out["iid"] < out["walk"]


def test_hurst_constant_series_null_and_empty(spark):
    df = spark.createDataFrame(_hourly_events([7] * 128))
    rows = hurst_rescaled_range(df, "g", "ts").collect()
    # every window has zero variance -> no usable scale -> group absent
    # (mean_rs NULL filtered) or NULL hurst; accept either contract
    assert rows == [] or all(r["hurst"] is None for r in rows)
    empty = hurst_rescaled_range(df.where("g = 'nope'"), "g", "ts")
    assert empty.count() == 0


def test_hurst_short_series_insufficient_scales(spark):
    # 12 buckets: only scale 8 has a complete window -> n_scales == 1 -> NULL
    rng = np.random.default_rng(5)
    df = spark.createDataFrame(_hourly_events(rng.integers(1, 20, 12)))
    rows = hurst_rescaled_range(df, "g", "ts").collect()
    assert len(rows) == 1
    assert rows[0]["n_scales"] == 1 and rows[0]["hurst"] is None
