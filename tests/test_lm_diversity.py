"""Lexical-diversity, Zipf-fit (operators/lm.py) and CUSUM change-point
(operators/stattests.py) vs hand-rolled numpy references."""

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.lm import lexical_diversity, zipf_fit
from htm_streamer_spark.operators.stattests import cusum_changepoint


# ---------------------------------------------------------------- CUSUM

def _cusum_ref(x):
    """Standardized CUSUM: max_k |S_k| / (sigma * sqrt(n)), argmax k."""
    x = np.asarray(x, dtype=float)
    n = len(x)
    dev = x - x.mean()
    s = np.cumsum(dev)
    sigma = x.std()  # population
    stat = np.round(np.abs(s) / (sigma * math.sqrt(n)) + 1e-9, 6)
    return float(stat.max()), int(np.argmax(stat))


def test_cusum_detects_level_shift(spark):
    rng = np.random.default_rng(5)
    x = np.concatenate([rng.normal(0, 1, 400), rng.normal(3, 1, 400)])
    pdf = pd.DataFrame({"g": "a", "i": np.arange(800), "v": x})
    out = cusum_changepoint(spark.createDataFrame(pdf), "g", "i", "v").collect()
    ref_stat, ref_cp = _cusum_ref(x)
    assert len(out) == 1
    row = out[0]
    assert row["n"] == 800
    assert row["cusum_stat"] == pytest.approx(ref_stat, abs=2e-6)
    assert row["cusum_stat"] > 1.36  # 5% Brownian-bridge critical value
    assert row["cp_i"] == ref_cp
    assert abs(row["cp_i"] - 399) <= 25  # located near the true shift


def test_cusum_constant_series_is_zero(spark):
    pdf = pd.DataFrame({"g": "a", "i": range(50), "v": [2.5] * 50})
    out = cusum_changepoint(spark.createDataFrame(pdf), "g", "i", "v").collect()
    assert out[0]["cusum_stat"] == 0.0 and out[0]["n"] == 50
    assert out[0]["cp_i"] == 0  # earliest order value on a flat max


def test_cusum_collapses_order_ties(spark):
    # two rows share each order value; the running sum must only be
    # evaluated at tie boundaries, so the answer equals the reference
    # on the collapsed (summed) series regardless of intra-tie order
    rng = np.random.default_rng(9)
    x = np.concatenate([rng.normal(0, 1, 100), rng.normal(2, 1, 100)])
    pdf = pd.DataFrame({"g": "a", "i": np.repeat(np.arange(100), 2), "v": x})
    shuffled = pdf.sample(frac=1.0, random_state=3).reset_index(drop=True)
    out = cusum_changepoint(
        spark.createDataFrame(shuffled).repartition(7), "g", "i", "v"
    ).collect()
    # reference on the collapsed grid: S at boundary k = cumsum of
    # per-order sums minus count*mean
    sums = pdf.groupby("i")["v"].agg(["sum", "count"])
    mean, n = x.mean(), len(x)
    s = np.cumsum(sums["sum"].values - sums["count"].values * mean)
    stat = np.round(np.abs(s) / (x.std() * math.sqrt(n)) + 1e-9, 6)
    assert out[0]["cusum_stat"] == pytest.approx(stat.max(), abs=2e-6)
    assert out[0]["cp_i"] == int(np.argmax(stat))


def test_cusum_no_shift_stays_small(spark):
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, 1000)
    pdf = pd.DataFrame({"g": "a", "i": np.arange(1000), "v": x})
    out = cusum_changepoint(spark.createDataFrame(pdf), "g", "i", "v").collect()
    ref_stat, _ = _cusum_ref(x)
    assert out[0]["cusum_stat"] == pytest.approx(ref_stat, abs=2e-6)
    assert out[0]["cusum_stat"] < 1.36  # stationary series: below critical


# ---------------------------------------------- lexical diversity / Zipf

def test_lexical_diversity_hand_computed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "source": ["a", "a", "b"],
                "text": ["x  X y", "y z", "solo"],
            }
        )
    )
    rows = {r["source"]: r for r in lexical_diversity(df, "source").collect()}
    a = rows["a"]  # tokens: x x y y z -> 5 tokens, 3 types
    assert a["n_tokens"] == 5 and a["n_types"] == 3
    assert a["ttr"] == pytest.approx(3 / 5, abs=1e-6)
    assert a["herdan_c"] == pytest.approx(math.log(3) / math.log(5), abs=1e-6)
    b = rows["b"]  # single token: herdan undefined (ln 1 denominator)
    assert b["n_tokens"] == 1 and b["n_types"] == 1
    assert b["ttr"] == pytest.approx(1.0, abs=1e-6)
    assert b["herdan_c"] is None


def test_zipf_fit_recovers_power_law(spark):
    # exact Zipf corpus: term w{r} appears round(3000 / r) times
    words = []
    for r in range(1, 101):
        words += [f"w{r:03d}"] * round(3000 / r)
    text = " ".join(words)
    df = spark.createDataFrame(pd.DataFrame({"text": [text]}))
    out = zipf_fit(df, top_k=100).collect()[0]
    assert out["n_terms"] == 100
    # numpy reference on the same (rank, ctf) grid with the same
    # deterministic tie-break (ctf desc, term asc)
    ctf = sorted(
        ((f"w{r:03d}", round(3000 / r)) for r in range(1, 101)),
        key=lambda t: (-t[1], t[0]),
    )
    x = np.log(np.arange(1, 101, dtype=float))
    y = np.log(np.array([c for _, c in ctf], dtype=float))
    slope, intercept = np.polyfit(x, y, 1)
    assert out["slope"] == pytest.approx(slope, abs=2e-6)
    assert out["intercept"] == pytest.approx(intercept, abs=2e-6)
    assert out["slope"] == pytest.approx(-1.0, abs=0.05)  # it IS Zipf
    assert out["r2"] > 0.999


def test_zipf_fit_flat_corpus_breaks_the_law(spark):
    # uniform frequencies: slope ~ 0 and r2 undefined/degenerate is the
    # "law broke" signal
    words = [f"u{r:02d}" for r in range(40)] * 25
    df = spark.createDataFrame(pd.DataFrame({"text": [" ".join(words)]}))
    out = zipf_fit(df, top_k=40).collect()[0]
    assert out["n_terms"] == 40
    assert abs(out["slope"]) < 1e-6
    assert out["r2"] is None  # zero variance in y -> no fit quality
