"""Rank statistics (operators/rankstats.py) vs pandas/numpy references."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.rankstats import (
    mann_whitney_u,
    spearman_corr,
)


def test_spearman_perfect_monotone(spark):
    pdf = pd.DataFrame(
        {"g": "a", "x": np.arange(200.0), "y": np.exp(np.arange(200.0) / 50)}
    )
    out = spearman_corr(spark.createDataFrame(pdf), "g", "x", "y").collect()
    assert out[0]["spearman_rho"] == 1.0 and out[0]["n"] == 200
    pdf["y"] = -pdf["y"]
    out = spearman_corr(spark.createDataFrame(pdf), "g", "x", "y").collect()
    assert out[0]["spearman_rho"] == -1.0


def test_spearman_matches_pandas_with_ties(spark):
    rng = np.random.default_rng(4)
    # coarse rounding plants heavy ties in both columns
    x = rng.normal(size=800).round(1)
    y = (x + rng.normal(0, 1.5, 800)).round(1)
    pdf = pd.DataFrame({"g": "a", "x": x, "y": y})
    out = spearman_corr(spark.createDataFrame(pdf), "g", "x", "y").collect()
    # midrank-based reference (Pearson of average ranks) — no scipy here
    ref = pdf["x"].rank(method="average").corr(pdf["y"].rank(method="average"))
    assert out[0]["spearman_rho"] == pytest.approx(ref, abs=2e-6)
    assert 0.2 < out[0]["spearman_rho"] < 0.95


def _mwu_ref(v, s):
    """Tie-corrected Mann-Whitney via midranks."""
    v, s = np.asarray(v, float), np.asarray(s)
    order = pd.Series(v).rank(method="average").to_numpy()
    n1, n0 = int((s == 1).sum()), int((s == 0).sum())
    r1 = order[s == 1].sum()
    u1 = r1 - n1 * (n1 + 1) / 2
    n = n0 + n1
    _, t = np.unique(v, return_counts=True)
    var = n0 * n1 / 12 * ((n + 1) - (t**3 - t).sum() / (n * (n - 1)))
    z = (u1 - n0 * n1 / 2) / np.sqrt(var) if var > 0 else None
    return u1, z


def test_mwu_matches_reference_with_ties(spark):
    rng = np.random.default_rng(6)
    a = rng.normal(0, 1, 400).round(1)
    b = rng.normal(0.6, 1, 300).round(1)  # shifted median
    v = np.concatenate([a, b])
    s = np.concatenate([np.zeros(400, int), np.ones(300, int)])
    pdf = pd.DataFrame({"g": "a", "v": v, "s": s})
    out = mann_whitney_u(
        spark.createDataFrame(pdf), "g", "v", "s"
    ).collect()[0]
    u_ref, z_ref = _mwu_ref(v, s)
    assert out["u1"] == pytest.approx(u_ref, abs=1e-9)
    assert out["mwu_z"] == pytest.approx(z_ref, abs=2e-6)
    assert out["mwu_z"] > 5  # the shift is visible
    assert (out["n0"], out["n1"]) == (400, 300)


def test_mwu_identical_samples_near_zero(spark):
    vals = np.arange(500.0)
    pdf = pd.DataFrame(
        {"g": "a", "v": np.repeat(vals, 2), "s": np.tile([0, 1], 500)}
    )
    out = mann_whitney_u(
        spark.createDataFrame(pdf), "g", "v", "s"
    ).collect()[0]
    assert abs(out["mwu_z"]) < 0.01


def test_mwu_all_tied_null_z(spark):
    pdf = pd.DataFrame({"g": "a", "v": [7.0] * 60, "s": [0, 1] * 30})
    out = mann_whitney_u(
        spark.createDataFrame(pdf), "g", "v", "s"
    ).collect()[0]
    assert out["mwu_z"] is None  # zero variance, not a crash


def test_spearman_multi_group_independent(spark):
    rng = np.random.default_rng(8)
    up = pd.DataFrame(
        {"g": "up", "x": np.arange(100.0), "y": np.arange(100.0)}
    )
    noise = pd.DataFrame(
        {"g": "rand", "x": np.arange(300.0), "y": rng.permutation(np.arange(300.0))}
    )
    out = {
        r["g"]: r["spearman_rho"]
        for r in spearman_corr(
            spark.createDataFrame(pd.concat([up, noise])), "g", "x", "y"
        ).collect()
    }
    assert out["up"] == 1.0
    assert abs(out["rand"]) < 0.2
