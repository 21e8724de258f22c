"""Gumbel block-maxima fit (extremes.gumbel_maxima), Wald SPRT
(stattests.sprt_bernoulli), and Wilson proportions
(stattests.wilson_proportions) vs sequential numpy references."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.extremes import gumbel_maxima
from htm_streamer_spark.operators.stattests import (
    sprt_bernoulli,
    wilson_proportions,
)
from pyspark.sql import functions as F

EULER = 0.57721566490153286554


def _hourly(group, maxima, per_day=4):
    """Rows whose daily maxima are exactly `maxima`."""
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    for d, m in enumerate(maxima):
        for h in range(per_day):
            v = m if h == 0 else m - 1.0 - h
            rows.append((group, t0 + pd.Timedelta(days=d, hours=h), float(v)))
    return rows


def test_gumbel_recovers_known_distribution(spark):
    # Block maxima drawn FROM a Gumbel(loc=100, scale=10): the
    # method-of-moments fit must land near the true parameters.
    rng = np.random.default_rng(12)
    maxima = 100.0 - 10.0 * np.log(-np.log(rng.uniform(size=400)))
    df = spark.createDataFrame(
        pd.DataFrame(_hourly("a", maxima), columns=["g", "ts", "v"])
    )
    got = gumbel_maxima(df, "g", "ts", "v", bucket="day").toPandas()
    mean, sd = maxima.mean(), maxima.std(ddof=1)
    scale = sd * math.sqrt(6.0) / math.pi
    loc = mean - EULER * scale
    assert int(got["n_blocks"][0]) == 400
    assert got["loc"][0] == pytest.approx(loc, abs=1e-6)
    assert got["scale"][0] == pytest.approx(scale, abs=1e-6)
    assert abs(got["loc"][0] - 100.0) < 2.0 and abs(got["scale"][0] - 10.0) < 1.5
    # return level formula, and the 365-day level must beat the 30-day
    rl30 = loc - scale * math.log(-math.log(1 - 1 / 30))
    assert got["rl_lo"][0] == pytest.approx(rl30, abs=1e-6)
    assert got["rl_hi"][0] > got["rl_lo"][0]
    assert got["max_observed"][0] == pytest.approx(maxima.max(), abs=1e-6)


def test_gumbel_thin_group_null_fit(spark):
    df = spark.createDataFrame(
        pd.DataFrame(_hourly("b", [5.0, 7.0]), columns=["g", "ts", "v"])
    )
    got = gumbel_maxima(df, "g", "ts", "v").toPandas()
    assert int(got["n_blocks"][0]) == 2
    assert pd.isna(got["loc"][0]) and pd.isna(got["rl_hi"][0])
    assert got["max_observed"][0] == 7.0


def _sprt_ref(flags, p0=0.1, p1=0.2, a=0.05, b=0.05):
    la, lb = math.log((1 - b) / a), math.log(b / (1 - a))
    wp, wn = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    llr = 0.0
    for i, x in enumerate(flags, 1):
        llr += wp if x else wn
        if llr >= la:
            return "accept_h1", i, llr
        if llr <= lb:
            return "accept_h0", i, llr
    return "continue", None, llr


def test_sprt_decisions_match_sequential_reference(spark):
    rng = np.random.default_rng(21)
    t0 = pd.Timestamp("2024-01-01")
    rows = []
    cases = {"hi": 0.25, "lo": 0.02, "mid": 0.13}
    for g, p in cases.items():
        for i, x in enumerate(rng.uniform(size=400) < p):
            rows.append((g, t0 + pd.Timedelta(minutes=i), i, float(100 * x)))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "ts", "event_id", "value"])
    )
    got = (
        sprt_bernoulli(
            df, "g", "ts", F.col("value") > 50.0, order_cols=("event_id",)
        )
        .toPandas()
        .set_index("g")
    )
    for g, p in cases.items():
        flags = [r[3] > 50.0 for r in rows if r[0] == g]
        d, step, llr = _sprt_ref(flags)
        assert got.loc[g, "decision"] == d, g
        if step is not None:
            assert int(got.loc[g, "step_at"]) == step
            assert got.loc[g, "llr_at"] == pytest.approx(llr, abs=1e-6)
        else:
            assert pd.isna(got.loc[g, "step_at"])
    # the elevated stream must accept H1, the clean one H0
    assert got.loc["hi", "decision"] == "accept_h1"
    assert got.loc["lo", "decision"] == "accept_h0"
    # sequential semantics: decision is at the FIRST crossing, so the
    # accept step is far earlier than the full 400-row stream
    assert int(got.loc["hi", "step_at"]) < 200


def _wilson_ref(k, n, z=1.959963984540054):
    p = k / n
    denom = 1 + z * z / n
    c = (p + z * z / (2 * n)) / denom
    h = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    return max(c - h, 0.0), min(c + h, 1.0)


def test_wilson_interval_and_two_proportion_z(spark):
    rows = [("a", 1)] * 30 + [("a", 0)] * 70 + [("b", 1)] * 5 + [("b", 0) ] * 195
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "f"]))
    got = (
        wilson_proportions(df, "g", F.col("f") == 1)
        .toPandas()
        .set_index("g")
    )
    lo, hi = _wilson_ref(30, 100)
    assert got.loc["a", "rate"] == pytest.approx(0.3, abs=1e-9)
    assert got.loc["a", "wilson_lo"] == pytest.approx(lo, abs=1e-6)
    assert got.loc["a", "wilson_hi"] == pytest.approx(hi, abs=1e-6)
    # two-proportion z of a (30/100) vs rest (=b: 5/200)
    p1, p2, pp = 0.3, 0.025, 35 / 300
    se = math.sqrt(pp * (1 - pp) * (1 / 100 + 1 / 200))
    assert got.loc["a", "z_vs_rest"] == pytest.approx((p1 - p2) / se, abs=1e-6)
    # symmetric: b vs rest flips sign with the same pooled p
    se_b = math.sqrt(pp * (1 - pp) * (1 / 200 + 1 / 100))
    assert got.loc["b", "z_vs_rest"] == pytest.approx((p2 - p1) / se_b, abs=1e-6)
    # interval at rate ~0 stays in [0, 1] (Wald would go negative)
    assert got.loc["b", "wilson_lo"] >= 0.0


def test_wilson_single_group_null_z(spark):
    df = spark.createDataFrame(pd.DataFrame({"g": ["x"] * 10, "f": [1] * 3 + [0] * 7}))
    got = wilson_proportions(df, "g", F.col("f") == 1).toPandas()
    assert pd.isna(got["z_vs_rest"][0])  # no complement to compare against
