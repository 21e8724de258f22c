"""Wald-Wolfowitz runs test (stattests.runs_test) vs a loop reference,
and the approx_percentile sketch-accuracy pin — the percentile
companion to test_hll_bound.py: the driver can't verify a sketch
against SQL, but the repo can bound it against the exact answer."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.stattests import runs_test


def _df(spark, groups_values):
    rows = []
    for g, vals in groups_values.items():
        for i, v in enumerate(vals):
            rows.append((g, i, float(v)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "seq", "v"])
    )


def _runs_ref(vals):
    med = float(np.median(vals))
    signs = [v > med for v in vals if v != med]
    n1, n2 = sum(signs), len(signs) - sum(signs)
    runs = 1 + sum(a != b for a, b in zip(signs, signs[1:])) if signs else 0
    n = n1 + n2
    if n1 == 0 or n2 == 0 or n < 2:
        return n1, n2, runs, None
    e = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    return n1, n2, runs, (runs - e) / np.sqrt(var) if var > 0 else None


def test_runs_matches_reference_on_random_series(spark):
    rng = np.random.default_rng(17)
    data = {"a": rng.normal(size=501), "b": rng.normal(size=300)}
    out = {
        r["g"]: r
        for r in runs_test(_df(spark, data), "g", "v", ["seq"]).collect()
    }
    for g, vals in data.items():
        n1, n2, runs, z = _runs_ref(vals)
        r = out[g]
        assert (r["n_pos"], r["n_neg"], r["runs"]) == (n1, n2, runs)
        assert r["z"] == pytest.approx(z, abs=2e-6)
        assert r["verdict"] == "random" and abs(r["z"]) < 1.96


def test_runs_detects_clustering_and_oscillation(spark):
    # sorted series = 2 runs (maximal clumping); alternating = max runs
    data = {
        "sorted": np.arange(100.0),
        "alternating": np.array([(-1.0) ** i * (1 + i % 3) for i in range(100)]),
    }
    out = {
        r["g"]: r
        for r in runs_test(_df(spark, data), "g", "v", ["seq"]).collect()
    }
    assert out["sorted"]["runs"] == 2
    assert out["sorted"]["verdict"] == "clustered"
    assert out["alternating"]["verdict"] == "oscillating"
    assert out["alternating"]["z"] > 1.96 > -1.96 > out["sorted"]["z"]


def test_runs_median_ties_dropped_and_degenerate(spark):
    # odd-length integer series: the median element itself is dropped
    data = {"t": [1.0, 2.0, 3.0, 2.0, 5.0]}  # median 2.0, two ties drop
    out = runs_test(_df(spark, data), "g", "v", ["seq"]).collect()[0]
    assert out["n_pos"] + out["n_neg"] == 3
    # constant series: everything equals the median -> empty group gone
    const = runs_test(
        _df(spark, {"c": [4.0] * 20}), "g", "v", ["seq"]
    ).collect()
    assert const == []
    empty = runs_test(
        _df(spark, {"x": [1.0]}).where("v < 0"), "g", "v", ["seq"]
    )
    assert empty.count() == 0


# ---------------------------------------------------------------------------
# approx_percentile accuracy pin (Greenwald-Khanna rank-error bound)
# ---------------------------------------------------------------------------


def test_approx_percentile_within_rank_error_bound(spark):
    """approx_percentile(accuracy=A) guarantees rank error <= n/A.
    Pin it against the exact empirical CDF at three quantiles on a
    deterministic skewed sample — the in-repo bound for the sketch
    tier the SQL oracle can't recompute (same stance as the HLL pin).
    """
    rng = np.random.default_rng(23)
    vals = np.concatenate(
        [rng.lognormal(3, 1, 20_000), rng.normal(1000, 10, 2_000)]
    )
    pdf = pd.DataFrame({"v": vals})
    df = spark.createDataFrame(pdf).repartition(8)
    accuracy = 1000
    qs = [0.25, 0.5, 0.9]
    got = df.agg(
        F.expr(
            f"approx_percentile(v, array({','.join(map(str, qs))}), {accuracy})"
        ).alias("ap")
    ).collect()[0]["ap"]
    svals = np.sort(vals)
    n = len(svals)
    eps = 1.0 / accuracy
    for phi, est in zip(qs, got):
        # empirical rank of the estimate must sit within phi +/- eps
        rank = np.searchsorted(svals, est, side="right") / n
        assert phi - eps - 1e-9 <= rank <= phi + eps + 1e-9, (phi, rank)
    # and the exact percentile itself agrees with numpy
    exact = df.agg(
        F.expr(
            f"percentile(v, array({','.join(map(str, qs))}))"
        ).alias("p")
    ).collect()[0]["p"]
    for phi, ev in zip(qs, exact):
        assert ev == pytest.approx(np.quantile(vals, phi), rel=1e-12)
