"""Cramér-von Mises two-sample statistic vs a brute-force reference."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import cvm_two_sample


def _cvm_ref(x0, x1):
    """Definitional T = nm/N^2 * sum over pooled obs of (F0-F1)^2 with
    ECDFs evaluated after ties."""
    x0, x1 = np.asarray(x0, float), np.asarray(x1, float)
    n, m = len(x0), len(x1)
    pooled = np.concatenate([x0, x1])
    f0 = np.searchsorted(np.sort(x0), pooled, side="right") / n
    f1 = np.searchsorted(np.sort(x1), pooled, side="right") / m
    return n * m / (n + m) ** 2 * np.sum((f0 - f1) ** 2)


def _df(spark, samples):
    rows = []
    for g, (x0, x1) in samples.items():
        rows += [(g, float(v), 0) for v in x0]
        rows += [(g, float(v), 1) for v in x1]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "v", "half"])
    )


def test_cvm_matches_reference_same_and_shifted(spark):
    rng = np.random.default_rng(19)
    samples = {
        "same": (rng.normal(size=400), rng.normal(size=350)),
        "shift": (rng.normal(size=400), rng.normal(0.8, 1, 350)),
    }
    out = {
        r["g"]: r
        for r in cvm_two_sample(_df(spark, samples), "g", "v", "half").collect()
    }
    for g, (x0, x1) in samples.items():
        ref = _cvm_ref(x0, x1)
        assert out[g]["cvm_stat"] == pytest.approx(ref, abs=2e-6)
        assert (out[g]["n0"], out[g]["n1"]) == (len(x0), len(x1))
    assert out["same"]["drift"] is False and out["same"]["cvm_stat"] < 0.461
    assert out["shift"]["drift"] is True and out["shift"]["cvm_stat"] > 0.461


def test_cvm_tie_heavy_integer_values(spark):
    rng = np.random.default_rng(29)
    x0 = rng.integers(0, 6, 300).astype(float)
    x1 = rng.integers(1, 7, 250).astype(float)
    out = cvm_two_sample(
        _df(spark, {"t": (x0, x1)}), "g", "v", "half"
    ).collect()[0]
    assert out["cvm_stat"] == pytest.approx(_cvm_ref(x0, x1), abs=2e-6)


def test_cvm_detects_tail_drift_ks_shrugs_at(spark):
    # identical core, 6% extreme right-tail contamination: the L2
    # integral accumulates it across the whole tail
    rng = np.random.default_rng(37)
    x0 = rng.normal(size=1000)
    x1 = np.concatenate([rng.normal(size=940), rng.normal(6, 0.5, 60)])
    out = cvm_two_sample(
        _df(spark, {"t": (x0, x1)}), "g", "v", "half"
    ).collect()[0]
    assert out["cvm_stat"] == pytest.approx(_cvm_ref(x0, x1), abs=2e-6)
    assert out["cvm_stat"] > 0.2


def test_cvm_missing_sample_and_empty(spark):
    df = _df(spark, {"only0": ([1.0, 2.0, 3.0], [])})
    out = cvm_two_sample(df, "g", "v", "half").collect()[0]
    assert out["cvm_stat"] is None and out["drift"] is None
    empty = cvm_two_sample(df.where("v < 0"), "g", "v", "half")
    assert empty.count() == 0


def test_ks_missing_sample_is_null_not_divide_by_zero(spark):
    # same ANSI-mode latent bug fixed in both ECDF operators: a group
    # with one sample empty must report NULL, not throw DIVIDE_BY_ZERO
    from htm_streamer_spark.operators.stattests import ks_two_sample

    df = _df(spark, {"only0": ([1.0, 2.0, 3.0], [])})
    out = ks_two_sample(df, "g", "v", "half").collect()[0]
    assert out["ks_stat"] is None and out["n1"] == 0


# ---------------------------------------------------------------------------
# Page-Hinkley
# ---------------------------------------------------------------------------


def _ph_ref(vals, delta=0.0):
    s = m = 0.0
    mn = float("inf")
    ph = 0.0
    for i, x in enumerate(vals, 1):
        s += x
        m += x - s / i - delta
        mn = min(mn, m)
        ph = max(ph, m - mn)
    return ph


def test_page_hinkley_matches_reference_and_detects_shift(spark):
    from htm_streamer_spark.operators.stattests import page_hinkley

    rng = np.random.default_rng(47)
    stable = rng.normal(10, 1, 400)
    shifted = np.concatenate([rng.normal(10, 1, 200), rng.normal(14, 1, 200)])
    rows = [("stable", i, float(v)) for i, v in enumerate(stable)]
    rows += [("shifted", i, float(v)) for i, v in enumerate(shifted)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "seq", "v"]))
    out = {
        r["g"]: r
        for r in page_hinkley(df, "g", "v", ["seq"], lam=50.0).collect()
    }
    assert out["stable"]["ph"] == pytest.approx(_ph_ref(stable), abs=2e-6)
    assert out["shifted"]["ph"] == pytest.approx(_ph_ref(shifted), abs=2e-6)
    assert out["shifted"]["alarm"] is True and out["stable"]["alarm"] is False
    assert out["shifted"]["ph"] > 10 * out["stable"]["ph"]
    # delta tolerance shrinks the statistic
    tol = page_hinkley(df, "g", "v", ["seq"], delta=5.0, lam=50.0).collect()
    assert all(r["ph"] <= out[r["g"]]["ph"] for r in tol)
    empty = page_hinkley(df.where("v < -100"), "g", "v", ["seq"])
    assert empty.count() == 0
