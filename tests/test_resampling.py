"""Poisson bootstrap (operators/resampling.py) vs a hashlib/numpy
reference recompute, plus the statistical properties that make it a
bootstrap at all: Poisson(1) weight marginals, CI coverage, and
partition-layout determinism."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.resampling import (
    POISSON1_CDF,
    poisson_bootstrap_mean_ci,
)


def _weight(row_id, b):
    """Reference recompute of one deterministic Poisson(1) draw."""
    h = hashlib.md5(f"{row_id}:{b}".encode()).hexdigest()
    u = int(h[:8], 16) / 4294967296.0
    return sum(1 for c in POISSON1_CDF if u >= c)


def _ref(df, n_replicas=48, alpha=0.05):
    """numpy recompute of the whole operator for one pandas frame."""
    out = {}
    for g, part in df.groupby("g"):
        ids = part["rid"].to_numpy()
        x = part["v"].to_numpy(dtype=float)
        means = []
        for b in range(n_replicas):
            w = np.array([_weight(i, b) for i in ids], dtype=float)
            if w.sum() > 0:
                means.append(float((w * x).sum() / w.sum()))
        means = np.asarray(means)
        out[g] = dict(
            n=len(x),
            mean=round(float(x.mean()), 6),
            n_boot=len(means),
            boot_se=round(float(means.std(ddof=1)), 6),
            ci_lo=round(
                float(np.quantile(means, alpha / 2, method="linear")), 6
            ),
            ci_hi=round(
                float(np.quantile(means, 1 - alpha / 2, method="linear")),
                6,
            ),
        )
    return out


def _mk(spark, n=300, groups=("a", "b"), seed=5):
    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for g in groups:
        for _ in range(n):
            rows.append({"g": g, "rid": rid, "v": float(rng.normal(20, 4))})
            rid += 1
    return spark.createDataFrame(pd.DataFrame(rows))


def test_matches_reference_recompute(spark):
    df = _mk(spark)
    ref = _ref(df.toPandas())
    out = {
        r["g"]: r
        for r in poisson_bootstrap_mean_ci(
            df, "g", "v", "rid", n_replicas=48
        ).collect()
    }
    assert set(out) == set(ref)
    for g, e in ref.items():
        r = out[g]
        assert r["n"] == e["n"] and r["n_boot"] == e["n_boot"]
        for k in ("mean", "boot_se", "ci_lo", "ci_hi"):
            assert r[k] == pytest.approx(e[k], abs=2e-6), (g, k)


def test_partition_layout_invariant(spark):
    """Weights are pure row functions — repartitioning cannot change
    the answer (the property a distributed bootstrap must have)."""
    df = _mk(spark, n=200, seed=9)
    a = sorted(
        poisson_bootstrap_mean_ci(df, "g", "v", "rid").collect(),
        key=lambda r: r["g"],
    )
    b = sorted(
        poisson_bootstrap_mean_ci(
            df.repartition(13), "g", "v", "rid"
        ).collect(),
        key=lambda r: r["g"],
    )
    for ra, rb in zip(a, b):
        assert ra == rb


def test_weights_are_poisson1(spark):
    """Marginal check: across rows x replicates the deterministic
    weights match the Poisson(1) pmf (chi-square well under the 1%
    critical value on 6 bins) and mean ~ 1."""
    n, B = 400, 48
    draws = np.array(
        [_weight(i, b) for i in range(n) for b in range(B)], dtype=float
    )
    assert draws.mean() == pytest.approx(1.0, abs=0.02)
    # bins 0..4 and >=5
    obs = np.array(
        [(draws == k).sum() for k in range(5)] + [(draws >= 5).sum()],
        dtype=float,
    )
    pmf = [math.exp(-1) / math.factorial(k) for k in range(5)]
    exp = np.array(pmf + [1 - sum(pmf)]) * len(draws)
    chi2 = float(((obs - exp) ** 2 / exp).sum())
    assert chi2 < 15.09  # chi2_{5, 0.99}


def test_ci_brackets_true_mean(spark):
    """Coverage sanity: on iid N(50, 2) data the 95% interval contains
    the sample mean (always, for a percentile interval around it) and
    the true mean (with overwhelming probability at n=500)."""
    rng = np.random.default_rng(11)
    pdf = pd.DataFrame(
        {
            "g": "a",
            "rid": np.arange(500),
            "v": rng.normal(50, 2, 500),
        }
    )
    df = spark.createDataFrame(pdf)
    r = poisson_bootstrap_mean_ci(df, "g", "v", "rid").collect()[0]
    assert r["ci_lo"] <= r["mean"] <= r["ci_hi"]
    assert r["ci_lo"] <= 50.0 <= r["ci_hi"]
    # bootstrap SE ~ sigma/sqrt(n) = 2/sqrt(500) ~ 0.089
    assert r["boot_se"] == pytest.approx(2 / math.sqrt(500), rel=0.5)


def test_empty_and_guards(spark):
    df = _mk(spark, n=5).limit(0)
    assert poisson_bootstrap_mean_ci(df, "g", "v", "rid").count() == 0
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(_mk(spark, n=5), "g", "v", "rid", n_replicas=1)
    with pytest.raises(ValueError):
        poisson_bootstrap_mean_ci(_mk(spark, n=5), "g", "v", "rid", alpha=1.5)
