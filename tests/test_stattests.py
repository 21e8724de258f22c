"""Statistical-test operators (operators/stattests.py) vs hand-rolled
numpy/pandas references — the battery a cross-engine validator pins:
KS, chi-squared independence, Benford, entropy, FD discovery, raw-moment
skew/kurtosis, MAD outliers."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.stattests import (
    benford_divergence,
    categorical_entropy,
    chi_squared_independence,
    fd_violation_summary,
    ks_two_sample,
    mad_count_outliers,
    moments_profile,
)


def _ks_ref(a, b):
    """Exact two-sample KS on the merged distinct-value grid."""
    grid = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def test_ks_identical_samples_is_zero(spark):
    rng = np.random.default_rng(7)
    vals = rng.normal(size=400).round(3)
    pdf = pd.DataFrame(
        {"g": "a", "v": np.repeat(vals, 2), "s": np.tile([0, 1], 400)}
    )
    out = ks_two_sample(spark.createDataFrame(pdf), "g", "v", "s").collect()
    assert len(out) == 1 and out[0]["ks_stat"] == 0.0
    assert out[0]["n0"] == 400 and out[0]["n1"] == 400


def test_ks_matches_numpy_reference(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0, 1, 500).round(3)
    b = rng.normal(0.5, 1.3, 300).round(3)  # genuinely drifted
    pdf = pd.DataFrame(
        {
            "g": "a",
            "v": np.concatenate([a, b]),
            "s": np.concatenate([np.zeros(500, int), np.ones(300, int)]),
        }
    )
    out = ks_two_sample(spark.createDataFrame(pdf), "g", "v", "s").collect()
    assert out[0]["ks_stat"] == pytest.approx(_ks_ref(a, b), abs=2e-6)
    assert out[0]["ks_stat"] > 0.1  # the drift is visible


def test_ks_tie_safety(spark):
    # heavy ties across both samples: ECDF must be evaluated after all
    # ties at a value, never mid-tie
    a = np.array([1.0] * 50 + [2.0] * 50)
    b = np.array([1.0] * 20 + [2.0] * 80)
    pdf = pd.DataFrame(
        {
            "g": "a",
            "v": np.concatenate([a, b]),
            "s": np.concatenate([np.zeros(100, int), np.ones(100, int)]),
        }
    )
    out = ks_two_sample(spark.createDataFrame(pdf), "g", "v", "s").collect()
    assert out[0]["ks_stat"] == pytest.approx(_ks_ref(a, b), abs=1e-9)  # 0.3


def _chi2_ref(pdf, a, b):
    ct = pd.crosstab(pdf[a], pdf[b])
    obs = ct.to_numpy(dtype=float)
    exp = np.outer(obs.sum(1), obs.sum(0)) / obs.sum()
    return float(((obs - exp) ** 2 / exp).sum()), (
        (obs.shape[0] - 1) * (obs.shape[1] - 1)
    )


def test_chisq_matches_crosstab_reference(spark):
    rng = np.random.default_rng(3)
    # dependent columns: b leans on a
    a = rng.integers(0, 4, 2000)
    b = (a + rng.integers(0, 3, 2000)) % 5
    pdf = pd.DataFrame({"a": a.astype(str), "b": b.astype(str)})
    out = chi_squared_independence(
        spark.createDataFrame(pdf), "a", "b"
    ).collect()[0]
    ref_stat, ref_dof = _chi2_ref(pdf, "a", "b")
    assert out["chi2"] == pytest.approx(ref_stat, abs=2e-6)
    assert out["dof"] == ref_dof and out["n"] == 2000


def test_chisq_zero_cells_counted(spark):
    # a 2x2 grid where one combination never occurs: the zero cell's
    # expected mass must still enter the statistic
    pdf = pd.DataFrame(
        {"a": ["x"] * 10 + ["y"] * 10, "b": ["p"] * 10 + ["q"] * 10}
    )
    out = chi_squared_independence(
        spark.createDataFrame(pdf), "a", "b"
    ).collect()[0]
    ref_stat, _ = _chi2_ref(pdf, "a", "b")  # crosstab has explicit 0s
    assert out["chi2"] == pytest.approx(ref_stat, abs=1e-9)  # == n == 20


def test_benford_conforming_vs_uniform(spark):
    rng = np.random.default_rng(5)
    # log-uniform magnitudes follow Benford; uniform [100, 200) puts
    # every first digit at 1 and diverges maximally
    conforming = np.exp(rng.uniform(0, math.log(10**6), 3000))
    clamped = rng.uniform(100, 200, 3000)
    pdf = pd.DataFrame(
        {
            "g": ["ok"] * 3000 + ["fab"] * 3000,
            "v": np.concatenate([conforming, clamped]),
        }
    )
    out = {
        r["g"]: r["benford_chi2"]
        for r in benford_divergence(
            spark.createDataFrame(pdf), "v", "g"
        ).collect()
    }
    assert out["ok"] < 30  # chi2 ~ dof=8 for conforming data
    assert out["fab"] > 1000  # all-ones data explodes


def test_entropy_uniform_and_collapsed(spark):
    pdf = pd.DataFrame(
        {
            "g": ["u"] * 400 + ["c"] * 400,
            "cat": [str(i % 4) for i in range(400)] + ["only"] * 400,
        }
    )
    out = {
        r["g"]: (r["entropy"], r["n_categories"])
        for r in categorical_entropy(
            spark.createDataFrame(pdf), "g", "cat"
        ).collect()
    }
    assert out["u"][0] == pytest.approx(math.log(4), abs=1e-6)
    assert out["u"][1] == 4
    assert out["c"] == (0.0, 1)


def test_fd_holds_and_violated(spark):
    # key -> key//10 is a function; key -> key%3 of a 30-row domain with
    # planted extra rows violates for exactly the planted keys
    rows = [(i, i // 10, "x") for i in range(100)]
    df = spark.createDataFrame(rows, "k long, d long, pad string")
    ok = fd_violation_summary(df, "k", "d").collect()[0]
    assert (ok["n_keys"], ok["n_violating"], ok["violation_rate"]) == (
        100,
        0,
        0.0,
    )
    rows += [(7, 99, "x"), (13, 99, "x")]  # two keys get a 2nd image
    df2 = spark.createDataFrame(rows, "k long, d long, pad string")
    bad = fd_violation_summary(df2, "k", "d").collect()[0]
    assert (bad["n_keys"], bad["n_violating"]) == (100, 2)
    assert bad["violation_rate"] == 0.02


def test_moments_match_numpy(spark):
    rng = np.random.default_rng(9)
    x = rng.gamma(2.0, 3.0, 5000)  # visibly right-skewed
    pdf = pd.DataFrame({"g": "a", "v": x})
    out = moments_profile(spark.createDataFrame(pdf), "g", "v").collect()[0]
    m = x.mean()
    m2, m3, m4 = ((x - m) ** 2).mean(), ((x - m) ** 3).mean(), (
        (x - m) ** 4
    ).mean()
    assert out["n"] == 5000
    assert out["skewness"] == pytest.approx(m3 / m2**1.5, abs=1e-5)
    assert out["excess_kurtosis"] == pytest.approx(m4 / m2**2 - 3, abs=1e-5)
    assert out["skewness"] > 0.5


def test_mad_flags_planted_burst_not_poisoned_by_it(spark):
    # 47 quiet buckets of ~100 rows, one 5000-row burst: a mean/std
    # gate would have its mean dragged; MAD flags exactly the burst
    rows = []
    for b in range(47):
        rows += [(b, i) for i in range(100 + (b % 3))]
    rows += [(99, i) for i in range(5000)]
    df = spark.createDataFrame(rows, "bucket long, i long")
    out = mad_count_outliers(df, F.col("bucket"), k=3.0).collect()
    assert len(out) == 1
    assert out[0]["bucket"] == 99 and out[0]["c"] == 5000
    assert out[0]["robust_z"] > 1000


def test_mad_constant_counts_flags_nothing(spark):
    rows = [(b, i) for b in range(20) for i in range(50)]
    df = spark.createDataFrame(rows, "bucket long, i long")
    assert mad_count_outliers(df, F.col("bucket"), k=3.0).count() == 0
