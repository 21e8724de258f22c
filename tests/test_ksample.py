"""K-sample battery (rankstats.py kruskal_wallis / brown_forsythe,
stattests.py welch_t) vs sequential numpy references."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.rankstats import (
    brown_forsythe,
    kruskal_wallis,
)
from htm_streamer_spark.operators.stattests import _CHI2_95, welch_t


def _frame(classes, group="g0"):
    rows = []
    for cls, vals in classes.items():
        rows += [{"g": group, "cls": cls, "v": float(x)} for x in vals]
    return pd.DataFrame(rows)


def _kw_ref(classes):
    pooled = np.concatenate([np.asarray(v, float) for v in classes.values()])
    n = len(pooled)
    vals, counts = np.unique(pooled, return_counts=True)
    before = np.cumsum(counts) - counts
    midrank = {v: b + (c + 1) / 2.0 for v, b, c in zip(vals, before, counts)}
    rsum = 0.0
    for v in classes.values():
        rj = sum(midrank[x] for x in np.asarray(v, float))
        rsum += rj * rj / len(v)
    h = 12.0 / (n * (n + 1)) * rsum - 3.0 * (n + 1)
    ties = float((counts.astype(float) ** 3 - counts).sum())
    c = 1.0 - ties / (n**3 - n)
    return round(h / c + 1e-9, 6) if c > 0 else None


def _bf_ref(classes):
    zs = {
        j: np.abs(np.asarray(v, float) - np.median(v))
        for j, v in classes.items()
    }
    n = sum(len(z) for z in zs.values())
    k = len(zs)
    zbar = sum(z.sum() for z in zs.values()) / n
    ssb = sum(len(z) * (z.mean() - zbar) ** 2 for z in zs.values())
    ssw = sum(((z - z.mean()) ** 2).sum() for z in zs.values())
    return round((n - k) / (k - 1) * ssb / ssw + 1e-9, 6)


def _welch_ref(a, b):
    a, b = np.asarray(a, float), np.asarray(b, float)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    dof = se2 * se2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return round(t + 1e-9, 6), round(dof + 1e-9, 6)


def test_kruskal_wallis_parity_and_regimes(spark):
    rng = np.random.default_rng(5)
    same = {
        "a": rng.integers(0, 60, 200),
        "b": rng.integers(0, 60, 210),
        "c": rng.integers(0, 60, 190),
    }
    shifted = {
        "a": rng.integers(0, 60, 200),
        "b": rng.integers(0, 60, 210),
        "c": rng.integers(25, 85, 190),  # location shift
    }
    pdf = pd.concat([_frame(same, "same"), _frame(shifted, "shift")])
    out = {
        r["g"]: r
        for r in kruskal_wallis(
            spark.createDataFrame(pdf).repartition(7), "g", "v", "cls"
        ).collect()
    }
    for name, classes in (("same", same), ("shift", shifted)):
        assert out[name]["n"] == 600 and out[name]["k"] == 3
        assert out[name]["h_stat"] == pytest.approx(
            _kw_ref(classes), abs=2e-6
        )
    assert out["shift"]["kw_reject"] is True
    assert out["same"]["kw_reject"] is (out["same"]["h_stat"] > _CHI2_95[2])


def test_kruskal_wallis_degenerates(spark):
    allsame = spark.createDataFrame(
        _frame({"a": [5] * 30, "b": [5] * 30})
    )
    r = kruskal_wallis(allsame, "g", "v", "cls").collect()[0]
    assert r["h_stat"] is None and r["kw_reject"] is None  # C <= 0
    onecls = spark.createDataFrame(_frame({"a": [1, 2, 3]}))
    r2 = kruskal_wallis(onecls, "g", "v", "cls").collect()[0]
    assert r2["k"] == 1 and r2["h_stat"] is None
    assert kruskal_wallis(onecls.where("g='x'"), "g", "v", "cls").count() == 0


def test_brown_forsythe_parity_and_regimes(spark):
    rng = np.random.default_rng(9)
    equal = {
        "a": rng.normal(0, 10, 220).round(2),
        "b": rng.normal(50, 10, 240).round(2),  # mean shift, same spread
        "c": rng.normal(-30, 10, 200).round(2),
    }
    hetero = {
        "a": rng.normal(0, 5, 220).round(2),
        "b": rng.normal(0, 5, 240).round(2),
        "c": rng.normal(0, 40, 200).round(2),  # variance explosion
    }
    pdf = pd.concat([_frame(equal, "eq"), _frame(hetero, "het")])
    out = {
        r["g"]: r
        for r in brown_forsythe(
            spark.createDataFrame(pdf).repartition(7), "g", "v", "cls"
        ).collect()
    }
    for name, classes in (("eq", equal), ("het", hetero)):
        assert out[name]["k"] == 3
        assert out[name]["bf_stat"] == pytest.approx(
            _bf_ref(classes), abs=2e-6
        )
    # BF is insensitive to pure mean shifts but fires on the spread
    assert out["het"]["bf_reject"] is True
    assert out["eq"]["bf_reject"] is (
        2.0 * out["eq"]["bf_stat"] > _CHI2_95[2]
    )


def test_brown_forsythe_degenerates(spark):
    constant = spark.createDataFrame(
        _frame({"a": [3] * 20, "b": [9] * 20})
    )
    r = brown_forsythe(constant, "g", "v", "cls").collect()[0]
    assert r["bf_stat"] is None  # zero within-class deviation SS
    onecls = spark.createDataFrame(_frame({"a": [1, 2, 3, 4]}))
    assert brown_forsythe(onecls, "g", "v", "cls").collect()[0][
        "bf_stat"
    ] is None


def test_welch_t_parity_and_regimes(spark):
    rng = np.random.default_rng(21)
    a0, b0 = rng.normal(100, 8, 300), rng.normal(100, 20, 280)  # same mean
    a1, b1 = rng.normal(100, 8, 300), rng.normal(108, 20, 280)  # shifted
    rows = []
    for g, (a, b) in (("same", (a0, b0)), ("shift", (a1, b1))):
        rows += [{"g": g, "s": 0, "v": float(x)} for x in a]
        rows += [{"g": g, "s": 1, "v": float(x)} for x in b]
    out = {
        r["g"]: r
        for r in welch_t(
            spark.createDataFrame(pd.DataFrame(rows)).repartition(7),
            "g",
            "v",
            "s",
        ).collect()
    }
    for name, (a, b) in (("same", (a0, b0)), ("shift", (a1, b1))):
        t, dof = _welch_ref(a, b)
        assert out[name]["n_a"] == 300 and out[name]["n_b"] == 280
        assert out[name]["t_stat"] == pytest.approx(t, abs=2e-6)
        assert out[name]["dof"] == pytest.approx(dof, rel=1e-6)
        assert out[name]["mean_diff"] == pytest.approx(
            float(a.mean() - b.mean()), abs=2e-6
        )
    assert out["shift"]["t_reject"] is True
    assert out["same"]["t_reject"] is (abs(out["same"]["t_stat"]) > 1.96)


def test_welch_t_degenerates(spark):
    tiny = spark.createDataFrame(
        pd.DataFrame(
            {"g": ["x"] * 3, "s": [0, 1, 1], "v": [1.0, 2.0, 4.0]}
        )
    )
    r = welch_t(tiny, "g", "v", "s").collect()[0]  # n_a = 1: no variance
    assert r["t_stat"] is None and r["t_reject"] is None
    onesided = spark.createDataFrame(
        pd.DataFrame({"g": ["y"] * 4, "s": [0] * 4, "v": [1.0, 2, 3, 4]})
    )
    r2 = welch_t(onesided, "g", "v", "s").collect()[0]
    assert r2["n_b"] == 0 and r2["mean_diff"] is None
    assert welch_t(tiny.where("g='z'"), "g", "v", "s").count() == 0
