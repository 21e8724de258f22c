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


# ---------------------------------------------------------------------------
# wasserstein_binned
# ---------------------------------------------------------------------------


def _w1_ref(groups):
    """groups: {g: np.array of bucket counts over a shared grid}."""
    pooled = sum(groups.values())
    qcdf = np.cumsum(pooled) / pooled.sum()
    return {
        g: float(np.abs(np.cumsum(c) / c.sum() - qcdf).sum())
        for g, c in groups.items()
    }


def test_wasserstein_matches_numpy(spark):
    from htm_streamer_spark.operators.stattests import wasserstein_binned

    rng = np.random.default_rng(7)
    groups = {f"g{i}": rng.integers(0, 50, size=12) for i in range(4)}
    # zero out some buckets so the sparse-support left-join path runs
    groups["g0"][3:6] = 0
    rows = [
        (g, b, int(c))
        for g, cs in groups.items()
        for b, c in enumerate(cs)
        if c > 0
    ]
    df = spark.createDataFrame(rows, ["group", "bucket", "cnt"])
    got = {
        r.group: r.w1
        for r in wasserstein_binned(df, "group", "bucket", "cnt").collect()
    }
    want = _w1_ref({g: c.astype(float) for g, c in groups.items()})
    assert set(got) == set(want)
    for g in want:
        assert got[g] == pytest.approx(want[g], abs=2e-6)


def test_wasserstein_identical_is_zero_and_shift_is_k(spark):
    from htm_streamer_spark.operators.stattests import wasserstein_binned

    # g_same == pooled shape => W1 0 against a pooled baseline of itself;
    # a point mass shifted k buckets from the (dominating) baseline mass
    # reads ~k in CDF-sum units
    rows = [("a", b, 100) for b in range(10)] + [("b", b, 100) for b in range(10)]
    df = spark.createDataFrame(rows, ["group", "bucket", "cnt"])
    out = {r.group: r.w1 for r in wasserstein_binned(df).collect()}
    assert out == {"a": 0.0, "b": 0.0}

    rows = [("base", 0, 10_000), ("shifted", 3, 1)]
    df = spark.createDataFrame(rows, ["group", "bucket", "cnt"])
    out = {r.group: r.w1 for r in wasserstein_binned(df).collect()}
    # point mass at bucket 3 vs pooled mass essentially at bucket 0:
    # |CDF gap| is ~1 at buckets 0,1,2 => W1 ~ 3
    assert out["shifted"] == pytest.approx(3.0, abs=1e-3)
    assert out["base"] == pytest.approx(0.0, abs=1e-3)


# ---------------------------------------------------------------------------
# benjamini_hochberg
# ---------------------------------------------------------------------------


def _bh_ref(pvals, q):
    """Classic step-up: reject ranks 1..k, k = max{i: p_(i) <= i*q/m}."""
    order = np.argsort(pvals, kind="stable")
    m = len(pvals)
    ranked = np.asarray(pvals)[order]
    hits = [i + 1 for i in range(m) if ranked[i] <= (i + 1) * q / m]
    k = max(hits) if hits else 0
    rejected = np.zeros(m, dtype=bool)
    rejected[order[:k]] = True
    return rejected


@pytest.mark.parametrize(
    "pvals",
    [
        [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.6],
        [0.9, 0.95, 0.99],  # nothing rejects
        [1e-9, 1e-8, 1e-7],  # everything rejects
        [0.01, 0.01, 0.01, 0.8],  # ties
    ],
)
def test_bh_matches_reference(spark, pvals):
    from htm_streamer_spark.operators.stattests import benjamini_hochberg

    df = spark.createDataFrame(
        [(f"t{i:02d}", float(p)) for i, p in enumerate(pvals)],
        ["test_id", "p_value"],
    )
    out = benjamini_hochberg(df, "p_value", q=0.05, tie_cols=("test_id",))
    got = {r.test_id: r.rejected for r in out.collect()}
    want = _bh_ref(pvals, 0.05)
    assert got == {f"t{i:02d}": bool(want[i]) for i in range(len(pvals))}
    # rank is a permutation of 1..m and thresholds are monotone
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(pvals) + 1))
    assert all(
        rows[i].bh_threshold <= rows[i + 1].bh_threshold
        for i in range(len(rows) - 1)
    )


def test_bh_rejection_set_is_p_prefix(spark):
    """BH rejections are always a prefix of the p-ascending order —
    never reject a larger p while keeping a smaller one."""
    from htm_streamer_spark.operators.stattests import benjamini_hochberg

    rng = np.random.default_rng(11)
    pv = np.concatenate([rng.uniform(0, 0.01, 5), rng.uniform(0.2, 1.0, 20)])
    df = spark.createDataFrame(
        [(f"t{i:02d}", float(p)) for i, p in enumerate(pv)],
        ["test_id", "p_value"],
    )
    rows = benjamini_hochberg(df, "p_value", q=0.05, tie_cols=("test_id",)).collect()
    rejected_ranks = sorted(r.rank for r in rows if r.rejected)
    assert rejected_ranks == list(range(1, len(rejected_ranks) + 1))
    assert len(rejected_ranks) >= 5  # the planted small p-values reject


def _holm_ref(pvals, alpha):
    """Loop reference: step down in p-ascending order, stop at the
    first rank that misses alpha/(m - i + 1)."""
    order = np.argsort(pvals, kind="stable")
    m = len(pvals)
    ranked = np.asarray(pvals)[order]
    rejected = np.zeros(m, dtype=bool)
    for i in range(m):
        if ranked[i] <= alpha / (m - i):
            rejected[order[i]] = True
        else:
            break
    return rejected


@pytest.mark.parametrize(
    "pvals",
    [
        [0.001, 0.008, 0.039, 0.041, 0.042, 0.06, 0.074, 0.205, 0.212, 0.6],
        [0.9, 0.95, 0.99],  # nothing rejects
        [1e-9, 1e-8, 1e-7],  # everything rejects
        [0.01, 0.01, 0.01, 0.8],  # ties
        # THE step-down differentiator: rank 2 (0.04) misses 0.05/2 but
        # rank 3 (0.016) would pass its own 0.05/1 — Holm must stop at
        # rank 2 and NOT reject rank 3, unlike a per-row threshold flag
        [0.004, 0.04, 0.016][:2] + [0.045],
    ],
)
def test_holm_matches_reference(spark, pvals):
    from htm_streamer_spark.operators.stattests import holm_stepdown

    df = spark.createDataFrame(
        [(f"t{i:02d}", float(p)) for i, p in enumerate(pvals)],
        ["test_id", "p_value"],
    )
    out = holm_stepdown(df, "p_value", alpha=0.05, tie_cols=("test_id",))
    got = {r.test_id: r.rejected for r in out.collect()}
    want = _holm_ref(pvals, 0.05)
    assert got == {f"t{i:02d}": bool(want[i]) for i in range(len(pvals))}
    rows = sorted(out.collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(1, len(pvals) + 1))
    # Holm thresholds ascend with rank (alpha / (m - i + 1))
    assert all(
        rows[i].holm_threshold <= rows[i + 1].holm_threshold
        for i in range(len(rows) - 1)
    )


def test_holm_stops_at_first_failure_even_if_later_p_passes(spark):
    from htm_streamer_spark.operators.stattests import holm_stepdown

    # m=3: thresholds are 0.05/3, 0.05/2, 0.05/1.
    # sorted p = (0.004, 0.030, 0.040): rank1 passes (0.004<=0.0167),
    # rank2 FAILS (0.030>0.025), rank3 would pass alone (0.040<=0.05)
    # but the step-down rule must keep it accepted.
    df = spark.createDataFrame(
        [("a", 0.004), ("b", 0.030), ("c", 0.040)], ["test_id", "p_value"]
    )
    got = {
        r.test_id: r.rejected
        for r in holm_stepdown(
            df, "p_value", alpha=0.05, tie_cols=("test_id",)
        ).collect()
    }
    assert got == {"a": True, "b": False, "c": False}


def test_holm_rejections_subset_of_bh(spark):
    from htm_streamer_spark.operators.stattests import (
        benjamini_hochberg,
        holm_stepdown,
    )

    rng = np.random.default_rng(29)
    pv = np.concatenate(
        [rng.uniform(0, 0.005, 4), rng.uniform(0.01, 0.2, 12), rng.uniform(0.5, 1, 9)]
    )
    df = spark.createDataFrame(
        [(f"t{i:02d}", float(p)) for i, p in enumerate(pv)],
        ["test_id", "p_value"],
    )
    bh = {
        r.test_id
        for r in benjamini_hochberg(
            df, "p_value", q=0.05, tie_cols=("test_id",)
        ).collect()
        if r.rejected
    }
    holm = {
        r.test_id
        for r in holm_stepdown(
            df, "p_value", alpha=0.05, tie_cols=("test_id",)
        ).collect()
        if r.rejected
    }
    assert holm <= bh  # FWER control is never more permissive than FDR
    assert len(holm) >= 1  # the planted tiny p-values still reject
