"""k-sample Anderson-Darling (operators/rankstats.py
anderson_darling_k) vs a sequential reference implementing the
published Scholz-Stephens equations, plus a null-distribution
calibration check that pins the mean/variance standardization
without any external stats library."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.rankstats import anderson_darling_k


def _ad_ref(samples):
    """Scholz & Stephens 1987, tie-aware midrank form A2akN + exact
    null moments (sequential, searchsorted formulation)."""
    Z = np.sort(np.concatenate(samples))
    Zstar = np.unique(Z)
    N, k, L = len(Z), len(samples), len(np.unique(Z))
    lf = (
        np.searchsorted(Z, Zstar, side="right")
        - np.searchsorted(Z, Zstar, side="left")
    ).astype(float)
    Bj = np.searchsorted(Z, Zstar, side="left") + lf / 2.0
    a2 = 0.0
    for s in samples:
        s = np.sort(np.asarray(s, dtype=float))
        nj = len(s)
        fij = (
            np.searchsorted(s, Zstar, side="right")
            - np.searchsorted(s, Zstar, side="left")
        ).astype(float)
        Mij = np.searchsorted(s, Zstar, side="left") + fij / 2.0
        inner = (
            lf
            / N
            * (N * Mij - nj * Bj) ** 2
            / (Bj * (N - Bj) - N * lf / 4.0)
        )
        a2 += inner.sum() / nj
    a2 *= (N - 1.0) / N
    H = sum(1.0 / len(s) for s in samples)
    inv = 1.0 / np.arange(1, N)
    hs = inv.sum()  # H_{N-1}
    cum = np.cumsum(inv)
    i = np.arange(1, N - 1)
    gs = float(((hs - cum[: N - 2]) / (N - i)).sum())
    a = (4 * gs - 6) * (k - 1) + (10 - 6 * gs) * H
    b = (
        (2 * gs - 4) * k**2
        + 8 * hs * k
        + (2 * gs - 14 * hs - 4) * H
        - 8 * hs
        + 4 * gs
        - 6
    )
    c = (
        (6 * hs + 2 * gs - 2) * k**2
        + (4 * hs - 4 * gs + 6) * k
        + (2 * hs - 6) * H
        + 4 * hs
    )
    d = (2 * hs + 6) * k**2 - 4 * hs * k
    var = (a * N**3 + b * N**2 + c * N + d) / (
        (N - 1.0) * (N - 2.0) * (N - 3.0)
    )
    if L < 2 or var <= 0:
        return None, None, None
    t = (a2 - (k - 1.0)) / math.sqrt(var)
    m = k - 1.0
    crit = 1.645 + 0.678 / math.sqrt(m) - 0.362 / m
    return (
        round(a2 + 1e-9, 6),
        round(t + 1e-9, 6),
        bool(t > crit),
    )


def test_null_calibration_of_reference():
    """E[A2] = k-1 and Var[A2] = sigma_N^2 under the null — simulated.
    This pins the statistic's standardization itself (no scipy in the
    container), so the Spark-vs-reference parity below inherits it."""
    rng = np.random.default_rng(3)
    sizes = (30, 25, 20)
    k = len(sizes)
    vals = []
    for _ in range(400):
        samples = [rng.normal(0, 1, n) for n in sizes]
        a2, t, _ = _ad_ref(samples)
        N = sum(sizes)
        # recover sigma from (a2, t): sigma = (a2 - (k-1)) / t
        vals.append((a2, t))
    a2s = np.array([v[0] for v in vals])
    ts = np.array([v[1] for v in vals])
    assert abs(a2s.mean() - (k - 1)) < 0.15
    # t is (a2 - E)/sigma: its empirical std must be ~1
    assert 0.75 < ts.std() < 1.25
    # 5% verdict fires at roughly the nominal rate under the null
    m = k - 1.0
    crit = 1.645 + 0.678 / math.sqrt(m) - 0.362 / m
    rate = (ts > crit).mean()
    assert rate < 0.12


def _to_pdf(samples_by_group):
    rows = []
    for g, samples in samples_by_group.items():
        for j, s in enumerate(samples):
            rows += [
                {"g": g, "cls": f"c{j}", "v": float(x)} for x in s
            ]
    return pd.DataFrame(rows)


def test_ad_matches_reference(spark):
    rng = np.random.default_rng(7)
    shifted = [
        rng.normal(0, 1, 40),
        rng.normal(0, 1, 35),
        rng.normal(1.2, 1, 30),  # one source drifted
    ]
    same = [rng.integers(0, 12, 45), rng.integers(0, 12, 40)]  # ties
    pdf = _to_pdf({"shifted": shifted, "same": [s.astype(float) for s in same]})
    df = spark.createDataFrame(pdf).repartition(6)
    out = {
        r["g"]: r
        for r in anderson_darling_k(df, "g", "v", "cls").collect()
    }
    for name, samples in (("shifted", shifted), ("same", same)):
        a2_ref, t_ref, rej_ref = _ad_ref(samples)
        r = out[name]
        assert r["a2_stat"] == pytest.approx(a2_ref, abs=2e-6)
        assert r["t_stat"] == pytest.approx(t_ref, abs=2e-6)
        assert r["ad_reject"] is rej_ref
    assert out["shifted"]["ad_reject"] is True
    assert out["same"]["ad_reject"] is False
    assert out["shifted"]["n"] == 105 and out["shifted"]["k"] == 3


def test_ad_tail_sensitivity_beyond_location(spark):
    """A variance-only change: same median, different spread. KW is
    blind to it by construction; AD must reject."""
    rng = np.random.default_rng(13)
    narrow = rng.normal(0, 1, 60)
    wide = rng.normal(0, 3, 60)
    pdf = _to_pdf({"g": [narrow, wide]})
    df = spark.createDataFrame(pdf)
    r = anderson_darling_k(df, "g", "v", "cls").collect()[0]
    a2_ref, t_ref, rej_ref = _ad_ref([narrow, wide])
    assert r["t_stat"] == pytest.approx(t_ref, abs=2e-6)
    assert r["ad_reject"] is True and rej_ref is True


def test_ad_degenerates(spark):
    # single distinct pooled value -> NULL
    pdf = _to_pdf({"g": [[5.0] * 10, [5.0] * 8]})
    r = anderson_darling_k(spark.createDataFrame(pdf), "g", "v", "cls").collect()[0]
    assert r["a2_stat"] is None and r["ad_reject"] is None
    # one class only -> NULL
    pdf1 = _to_pdf({"g": [[1.0, 2.0, 3.0, 4.0, 5.0]]})
    r1 = anderson_darling_k(spark.createDataFrame(pdf1), "g", "v", "cls").collect()[0]
    assert r1["k"] == 1 and r1["t_stat"] is None
    # tiny N (< 4) -> NULL
    pdf2 = _to_pdf({"g": [[1.0], [2.0, 3.0]]})
    r2 = anderson_darling_k(spark.createDataFrame(pdf2), "g", "v", "cls").collect()[0]
    assert r2["n"] == 3 and r2["t_stat"] is None
