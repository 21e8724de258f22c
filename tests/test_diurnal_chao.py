"""Diurnal harmonic fit (stattests.diurnal_harmonic) and Chao1
richness (lm.chao_richness) vs numpy/counter references."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.lm import chao_richness
from htm_streamer_spark.operators.stattests import diurnal_harmonic


def _events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def _dft_ref(x):
    """First-harmonic fit on the 24-point profile."""
    h = np.arange(24)
    a = (2 / 24) * np.sum(x * np.cos(2 * np.pi * h / 24))
    b = (2 / 24) * np.sum(x * np.sin(2 * np.pi * h / 24))
    amp = math.hypot(a, b)
    peak = (math.atan2(b, a) * 24 / (2 * np.pi)) % 24
    var = np.var(x)
    return amp, peak, (amp * amp / 2 / var) if var > 0 else None


def test_diurnal_recovers_planted_sinusoid(spark):
    # counts per hour follow 20 + 10*cos(2pi(h-7)/24) over 3 days:
    # peak hour 7, near-total variance explained
    rows = []
    for day in range(3):
        for h in range(24):
            n = round(20 + 10 * math.cos(2 * math.pi * (h - 7) / 24))
            base = pd.Timestamp("2024-06-01") + pd.Timedelta(days=day, hours=h)
            rows += [("wave", base)] * n
    out = diurnal_harmonic(
        _events(spark, rows), "event_type", "ts"
    ).collect()[0]
    # reference from the actual totals (rounding perturbs the pure wave)
    x = np.zeros(24)
    for t, ts in rows:
        x[ts.hour] += 1
    amp, peak, r2 = _dft_ref(x)
    assert out["amplitude"] == pytest.approx(amp, abs=2e-6)
    assert out["peak_hour"] == pytest.approx(peak, abs=2e-6)
    assert out["r2"] == pytest.approx(r2, abs=2e-6)
    assert out["peak_hour"] == pytest.approx(7.0, abs=0.2)
    assert out["r2"] > 0.97


def test_diurnal_flat_profile_and_missing_hours(spark):
    rows = []
    # flat: equal counts every hour -> var 0 -> NULL r2, amplitude ~0
    for h in range(24):
        rows += [("flat", pd.Timestamp("2024-06-01") + pd.Timedelta(hours=h))] * 5
    # spike: all volume at hour 3, other 23 hours MISSING (must count 0)
    rows += [("spike", pd.Timestamp("2024-06-01 03:30"))] * 48
    out = {r["event_type"]: r for r in diurnal_harmonic(
        _events(spark, rows), "event_type", "ts"
    ).collect()}
    assert out["flat"]["r2"] is None
    assert out["flat"]["amplitude"] == pytest.approx(0.0, abs=1e-6)
    x = np.zeros(24); x[3] = 48
    amp, peak, r2 = _dft_ref(x)
    assert out["spike"]["amplitude"] == pytest.approx(amp, abs=2e-6)
    assert out["spike"]["peak_hour"] == pytest.approx(3.0, abs=1e-6)
    assert out["spike"]["r2"] == pytest.approx(r2, abs=2e-6)


def test_diurnal_empty_input(spark):
    df = _events(spark, [("a", "2024-01-01")]).where("event_type = 'z'")
    assert diurnal_harmonic(df, "event_type", "ts").count() == 0


# ---------------------------------------------------------------------------
# Chao1
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )


def _chao_ref(texts):
    c = Counter(w for t in texts for w in t.lower().split())
    v, n = len(c), sum(c.values())
    f1 = sum(1 for x in c.values() if x == 1)
    f2 = sum(1 for x in c.values() if x == 2)
    return n, v, f1, f2, v + f1 * (f1 - 1) / (2 * (f2 + 1)), 1 - f1 / n


def test_chao_matches_counter_reference(spark):
    rng = np.random.default_rng(41)
    # zipf-ish draws so singletons/doubletons are plentiful
    vocab = [f"w{i}" for i in range(400)]
    p = 1 / np.arange(1, 401); p /= p.sum()
    texts = [
        " ".join(rng.choice(vocab, size=30, p=p)) for _ in range(40)
    ]
    rows = [(i, "s", t) for i, t in enumerate(texts)]
    out = chao_richness(_docs(spark, rows), "source").collect()[0]
    n, v, f1, f2, chao1, cov = _chao_ref(texts)
    assert (out["n_tokens"], out["n_types"], out["f1"], out["f2"]) == (
        n, v, f1, f2,
    )
    assert out["chao1"] == pytest.approx(chao1, abs=2e-6)
    assert out["coverage"] == pytest.approx(cov, abs=2e-6)
    assert out["chao1"] >= out["n_types"]


def test_chao_exhausted_vocabulary(spark):
    # every type seen many times: F1 = 0 -> chao1 == n_types, coverage 1
    rows = [(i, "s", "alpha beta gamma alpha beta gamma") for i in range(5)]
    out = chao_richness(_docs(spark, rows), "source").collect()[0]
    assert out["f1"] == 0 and out["chao1"] == float(out["n_types"]) == 3.0
    assert out["coverage"] == 1.0


def test_chao_all_singletons_and_empty(spark):
    out = chao_richness(
        _docs(spark, [(0, "s", "a b c d")]), "source"
    ).collect()[0]
    # V=4, F1=4, F2=0 -> chao1 = 4 + 4*3/2 = 10; coverage 0
    assert out["chao1"] == 10.0 and out["coverage"] == 0.0
    empty = chao_richness(
        _docs(spark, [(0, "s", "x")]).where("doc_id < 0"), "source"
    )
    assert empty.count() == 0