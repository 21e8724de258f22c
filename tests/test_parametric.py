"""Weibull log-moment gap fit and L-moments (operators/parametric.py)
vs numpy references, including parameter recovery on known draws."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.parametric import l_moments, weibull_gaps

EULER = 0.57721566490153286554


def _weibull_ref(gaps):
    ln = np.log(gaps)
    sd = ln.std(ddof=1)
    if sd == 0 or len(gaps) < 3:
        return None, None
    k = math.pi / (sd * math.sqrt(6.0))
    lam = math.exp(ln.mean() + EULER / k)
    return k, lam


def _rows_from_gaps(group, ent, gaps, t0="2024-01-01"):
    t = pd.Timestamp(t0)
    rows = [(group, ent, t)]
    for gsec in gaps:
        t = t + pd.Timedelta(seconds=float(gsec))
        rows.append((group, ent, t))
    return rows


def test_weibull_recovers_shape_on_known_draws(spark):
    rng = np.random.default_rng(7)
    cases = {"bursty": 0.6, "poisson": 1.0, "regular": 2.5}
    rows = []
    gaps_by_g = {}
    for g, k in cases.items():
        gaps = 10.0 * rng.weibull(k, 1500)
        gaps = gaps[gaps > 0]
        gaps_by_g[g] = gaps
        rows += _rows_from_gaps(g, 1, gaps)
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "e", "ts"]))
    got = weibull_gaps(df, "g", "e").toPandas().set_index("g")
    for g, k_true in cases.items():
        k_ref, lam_ref = _weibull_ref(gaps_by_g[g])
        assert got.loc[g, "shape"] == pytest.approx(k_ref, rel=1e-4)
        assert got.loc[g, "scale"] == pytest.approx(lam_ref, rel=1e-4)
        # estimator consistency: within 15% of the true shape at n=1500
        assert abs(got.loc[g, "shape"] - k_true) / k_true < 0.15
    # ordering is the deliverable: bursty < poisson < regular
    assert got.loc["bursty", "shape"] < got.loc["poisson", "shape"] < got.loc["regular", "shape"]


def test_weibull_pools_entities_and_guards(spark):
    # two entities' gaps pool per group; zero gaps excluded
    rows = (
        _rows_from_gaps("a", 1, [10, 20, 30])
        + _rows_from_gaps("a", 2, [5, 0, 15])  # 0-gap (dup ts) dropped
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "e", "ts"]))
    got = weibull_gaps(df, "g", "e").toPandas()
    assert int(got["n_gaps"][0]) == 5  # 3 + 3 − 1 zero gap
    gaps = np.array([10.0, 20, 30, 5, 15])
    k_ref, lam_ref = _weibull_ref(gaps)
    assert got["shape"][0] == pytest.approx(k_ref, rel=1e-4)
    assert got["mean_gap"][0] == pytest.approx(gaps.mean(), abs=1e-6)
    # < 3 gaps → NULL fit
    tiny = spark.createDataFrame(
        pd.DataFrame(_rows_from_gaps("t", 1, [10, 20]), columns=["g", "e", "ts"])
    )
    got2 = weibull_gaps(tiny, "g", "e").toPandas()
    assert int(got2["n_gaps"][0]) == 2 and pd.isna(got2["shape"][0])
    # a SINGLE gap (n-1 == 0 in the variance) must yield NULL, not an
    # ANSI divide-by-zero
    one = spark.createDataFrame(
        pd.DataFrame(_rows_from_gaps("o", 1, [10]), columns=["g", "e", "ts"])
    )
    got3 = weibull_gaps(one, "g", "e").toPandas()
    assert int(got3["n_gaps"][0]) == 1 and pd.isna(got3["shape"][0])


def _lmom_ref(x):
    x = np.sort(np.asarray(x, float))
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = (x * (i - 1) / (n - 1)).mean()
    b2 = (x * (i - 1) * (i - 2) / ((n - 1) * (n - 2))).mean()
    b3 = (x * (i - 1) * (i - 2) * (i - 3) / ((n - 1) * (n - 2) * (n - 3))).mean()
    l1, l2 = b0, 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    return l1, l2, l2 / l1, l3 / l2, l4 / l2


def test_l_moments_match_reference_and_known_shapes(spark):
    rng = np.random.default_rng(19)
    sym = rng.normal(100, 10, 3000)
    skewed = rng.exponential(10.0, 3000)
    rows = [("sym", float(v)) for v in sym] + [("exp", float(v)) for v in skewed]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x"]))
    got = l_moments(df, "g", "x").toPandas().set_index("g")
    for g, xs in [("sym", sym), ("exp", skewed)]:
        l1, l2, lcv, t3, t4 = _lmom_ref(xs)
        assert got.loc[g, "l1"] == pytest.approx(l1, abs=1e-5)
        assert got.loc[g, "l2"] == pytest.approx(l2, abs=1e-5)
        assert got.loc[g, "l_cv"] == pytest.approx(lcv, abs=1e-6)
        assert got.loc[g, "l_skew"] == pytest.approx(t3, abs=1e-6)
        assert got.loc[g, "l_kurt"] == pytest.approx(t4, abs=1e-6)
    # known shapes: normal t3 ≈ 0, exponential t3 ≈ 1/3 (exact pop value)
    assert abs(got.loc["sym", "l_skew"]) < 0.03
    assert abs(got.loc["exp", "l_skew"] - 1 / 3) < 0.03
    # boundedness, unlike classical skew/kurtosis
    assert (got["l_skew"].abs() < 1).all() and (got["l_kurt"].abs() < 1).all()


def test_l_moments_robustness_and_guards(spark):
    # robustness = bounded influence: a 10x outlier barely moves the
    # ratios, and even a 1e7x one can only push them to their ±1
    # ceiling (classical kurtosis goes to ~n under the same insult)
    base = list(np.linspace(0, 100, 1000))
    rows = (
        [("clean", v) for v in base]
        + [("dirty", v) for v in base + [1000.0]]
        + [("wild", v) for v in base + [1e9]]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x"]))
    got = l_moments(df, "g", "x").toPandas().set_index("g")
    assert abs(got.loc["dirty", "l_kurt"] - got.loc["clean", "l_kurt"]) < 0.06
    assert abs(got.loc["wild", "l_kurt"]) <= 1.0 + 1e-9
    wild = np.array(base + [1e9])
    classical_kurt = ((wild - wild.mean()) ** 4).mean() / wild.var() ** 2
    assert classical_kurt > 900  # the comparison that motivates L-moments
    # constant column → l2 == 0 → NULL ratios; n<4 → NULL l2 and ratios
    small = spark.createDataFrame(
        pd.DataFrame({"g": ["c"] * 5 + ["t"] * 3, "x": [7.0] * 5 + [1.0, 2.0, 3.0]})
    )
    got2 = l_moments(small, "g", "x").toPandas().set_index("g")
    assert got2.loc["c", "l2"] == pytest.approx(0.0, abs=1e-9)
    assert pd.isna(got2.loc["c", "l_skew"])
    assert pd.isna(got2.loc["t", "l2"]) and pd.isna(got2.loc["t", "l_kurt"])
