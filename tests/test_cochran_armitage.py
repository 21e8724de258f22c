"""Cochran-Armitage proportion-trend test (operators/stattests.py
cochran_armitage) vs a sequential numpy reference."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import cochran_armitage


def _events(day_counts_by_class, start="2024-01-01"):
    """day_counts_by_class: {class: [count per day]}."""
    t0 = pd.Timestamp(start)
    rows = []
    for cls, counts in day_counts_by_class.items():
        for d, n in enumerate(counts):
            ts = t0 + pd.Timedelta(days=d, hours=3)
            rows += [{"cls": cls, "ts": ts}] * int(n)
    return pd.DataFrame(rows)


def _ca_ref(y, n):
    """Textbook CA: T = sum s(y - n p), Var = p(1-p)(sum n s^2 -
    (sum n s)^2 / N), s = 0..T-1."""
    y = np.asarray(y, dtype=float)
    n = np.asarray(n, dtype=float)
    s = np.arange(len(y), dtype=float)
    p = y.sum() / n.sum()
    t = float((s * (y - n * p)).sum())
    var = p * (1 - p) * float((s * s * n).sum() - (s * n).sum() ** 2 / n.sum())
    if var <= 0:
        return None
    return round(t / math.sqrt(var) + 1e-9, 6)


def test_matches_reference_and_detects_mix_drift(spark):
    rng = np.random.default_rng(6)
    days = 30
    # 'err' share creeps up while total volume also grows — the
    # compositional question absolute-count trend tests get wrong
    base = rng.integers(90, 110, days) + np.arange(days) * 5
    err = np.round(base * (0.05 + 0.004 * np.arange(days))).astype(int)
    ok = base - err
    pdf = _events({"err": err, "ok": ok})
    df = spark.createDataFrame(pdf).repartition(7)
    out = {r["cls"]: r for r in cochran_armitage(df, "cls", "ts").collect()}
    n_t = err + ok
    for cls, y in (("err", err), ("ok", ok)):
        z_ref = _ca_ref(y, n_t)
        assert out[cls]["z"] == pytest.approx(z_ref, abs=2e-6)
        assert out[cls]["n_buckets"] == days
        assert out[cls]["n_class"] == int(y.sum())
        assert out[cls]["n_total"] == int(n_t.sum())
    assert out["err"]["trend"] == "increasing"
    assert out["ok"]["trend"] == "decreasing"


def test_flat_mix_with_volume_trend_is_none(spark):
    rng = np.random.default_rng(11)
    days = 40
    total = 200 + np.arange(days) * 20  # strong VOLUME trend
    a = np.array([int(t * 0.3) + int(rng.integers(-3, 4)) for t in total])
    b = total - a  # share of a stays ~0.3
    df = spark.createDataFrame(_events({"a": a, "b": b}))
    out = {r["cls"]: r for r in cochran_armitage(df, "cls", "ts").collect()}
    # the share is flat: CA must NOT fire even though counts explode
    assert out["a"]["trend"] == "none" and out["b"]["trend"] == "none"
    assert out["a"]["z"] == pytest.approx(
        _ca_ref(a, total), abs=2e-6
    )


def test_absent_bucket_counts_as_zero_and_degenerates(spark):
    # class 'rare' appears only on day 3 of 4: y_t = 0 elsewhere
    df = spark.createDataFrame(
        _events({"com": [10, 10, 10, 10], "rare": [0, 0, 5, 0]})
    )
    out = {r["cls"]: r for r in cochran_armitage(df, "cls", "ts").collect()}
    assert out["rare"]["n_buckets"] == 4 and out["rare"]["n_class"] == 5
    ref = _ca_ref([0, 0, 5, 0], [10, 10, 15, 10])
    assert out["rare"]["z"] == pytest.approx(ref, abs=2e-6)
    # single class: p == 1 -> NULL z, NULL trend
    one = spark.createDataFrame(_events({"only": [5, 6, 7]}))
    r = cochran_armitage(one, "cls", "ts").collect()[0]
    assert r["z"] is None and r["trend"] is None
    # single bucket: zero score spread -> NULL
    single = spark.createDataFrame(_events({"a": [5], "b": [7]}))
    for r in cochran_armitage(single, "cls", "ts").collect():
        assert r["z"] is None
