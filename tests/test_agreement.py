"""Cohen's kappa, calibration bins, and longest-runs
(operators/agreement.py) vs literal references."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.agreement import (
    calibration_bins,
    cohens_kappa,
    longest_runs,
)
from pyspark.sql import functions as F


def _kappa_ref(a, b):
    from collections import Counter

    n = len(a)
    po = sum(x == y for x, y in zip(a, b)) / n
    ca, cb = Counter(a), Counter(b)
    pe = sum(ca[k] * cb.get(k, 0) for k in ca) / (n * n)
    return po, pe, (po - pe) / (1 - pe)


def test_kappa_matches_reference_and_beats_chance_reading(spark):
    rng = np.random.default_rng(8)
    truth = list(rng.choice(["en", "de", "fr"], 400, p=[0.7, 0.2, 0.1]))
    pred = [t if rng.uniform() < 0.8 else "en" for t in truth]
    got = cohens_kappa(
        spark.createDataFrame(pd.DataFrame({"a": pred, "b": truth})), "a", "b"
    ).toPandas()
    po, pe, k = _kappa_ref(pred, truth)
    assert int(got["n_rows"][0]) == 400
    assert got["po"][0] == pytest.approx(po, abs=1e-6)
    assert got["pe"][0] == pytest.approx(pe, abs=1e-6)
    assert got["kappa"][0] == pytest.approx(k, abs=1e-6)
    # skewed marginals: kappa must sit well below raw accuracy
    assert got["kappa"][0] < got["po"][0] - 0.05


def test_kappa_edges(spark):
    # perfect agreement → kappa 1; union label space counted
    df = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y", "z", "w"], "b": ["x", "y", "z", "q"]})
    )
    got = cohens_kappa(df, "a", "b").toPandas()
    assert int(got["n_categories"][0]) == 5  # x y z w q
    perfect = spark.createDataFrame(
        pd.DataFrame({"a": ["x", "y"] * 10, "b": ["x", "y"] * 10})
    )
    got2 = cohens_kappa(perfect, "a", "b").toPandas()
    assert got2["kappa"][0] == pytest.approx(1.0, abs=1e-9)
    # both raters constant and equal: pe == 1 → NULL kappa
    const = spark.createDataFrame(pd.DataFrame({"a": ["x"] * 5, "b": ["x"] * 5}))
    got3 = cohens_kappa(const, "a", "b").toPandas()
    assert pd.isna(got3["kappa"][0])
    # nulls excluded
    nulls = spark.createDataFrame(
        pd.DataFrame({"a": ["x", None, "y"], "b": [None, "x", "y"]})
    )
    assert int(cohens_kappa(nulls, "a", "b").toPandas()["n_rows"][0]) == 1


def test_calibration_bins_reference_and_fold(spark):
    rng = np.random.default_rng(14)
    s = rng.uniform(size=2000)
    y = rng.uniform(size=2000) < s  # perfectly calibrated by design
    pdf = pd.DataFrame({"g": "a", "s": s, "y": y})
    pdf.loc[0, "s"] = 1.0  # exact 1.0 must fold into bin 9
    got = (
        calibration_bins(
            spark.createDataFrame(pdf), "g", F.col("s"), F.col("y"), n_bins=10
        )
        .orderBy("bin")
        .toPandas()
    )
    assert list(got["bin"]) == list(range(10))
    bins = np.clip((pdf["s"] * 10).astype(int), 0, 9)
    for b in range(10):
        sel = pdf[bins == b]
        assert int(got["n_rows"][b]) == len(sel)
        assert got["mean_score"][b] == pytest.approx(sel["s"].mean(), abs=1e-6)
        assert got["frac_pos"][b] == pytest.approx(sel["y"].mean(), abs=1e-6)
    # calibrated score: every bin's gap is small
    assert (got["abs_gap"] < 0.1).all()
    # ECE from the cells is near zero for a calibrated score
    ece = float((got["abs_gap"] * got["n_rows"]).sum() / got["n_rows"].sum())
    assert ece < 0.05


def test_calibration_detects_overconfidence(spark):
    # score says 0.9 but the truth rate is 0.5 → top bin gap ~0.4
    pdf = pd.DataFrame(
        {"g": "a", "s": [0.9] * 200, "y": [True, False] * 100}
    )
    got = calibration_bins(
        spark.createDataFrame(pdf), "g", F.col("s"), F.col("y")
    ).toPandas()
    assert len(got) == 1 and int(got["bin"][0]) == 9
    assert got["abs_gap"][0] == pytest.approx(0.4, abs=1e-9)


def _runs_ref(vals):
    runs = []
    for v in vals:
        if runs and (runs[-1][0] == v or (runs[-1][0] is None and v is None)):
            runs[-1][1] += 1
        else:
            runs.append([v, 1])
    longest = max(range(len(runs)), key=lambda i: (runs[i][1], -i))
    return len(runs), runs[longest][1], runs[longest][0]


def test_longest_runs_matches_reference(spark):
    rng = np.random.default_rng(3)
    vals = list(rng.choice(["a", "b"], 300)) + ["stuck"] * 40 + ["b", "a"]
    pdf = pd.DataFrame({"g": "s1", "i": range(len(vals)), "v": vals})
    got = longest_runs(spark.createDataFrame(pdf), "g", "v", ["i"]).toPandas()
    n_runs, longest, val = _runs_ref(vals)
    assert int(got["n_rows"][0]) == len(vals)
    assert int(got["n_runs"][0]) == n_runs
    assert int(got["longest_run"][0]) == longest == 40
    assert got["longest_run_value"][0] == val == "stuck"
    assert got["mean_run_len"][0] == pytest.approx(len(vals) / n_runs, abs=1e-6)


def test_longest_runs_null_runs_and_ties(spark):
    # NULLs form their own run; equal-length tie → earliest run wins
    pdf = pd.DataFrame(
        {
            "g": "x",
            "i": range(8),
            "v": ["a", "a", None, None, "b", "b", "c", "d"],
        }
    )
    got = longest_runs(spark.createDataFrame(pdf), "g", "v", ["i"]).toPandas()
    assert int(got["n_runs"][0]) == 5
    assert int(got["longest_run"][0]) == 2
    assert got["longest_run_value"][0] == "a"  # earliest of the 2-ties
