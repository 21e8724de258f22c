"""Batch-8 operators: Mahalanobis multivariate outliers
(operators/multivariate.py), token-weighted quantiles
(operators/mixing.py weighted_quantiles), freshness/staleness
(operators/profiling.py freshness)."""

from __future__ import annotations

import datetime as dt
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.mixing import weighted_quantiles
from htm_streamer_spark.operators.multivariate import mahalanobis_2d
from htm_streamer_spark.operators.profiling import freshness

# ---------------------------------------------------------------- mahalanobis


def _maha_ref(pts: list[tuple[float, float]]) -> list[float]:
    a = np.array(pts)
    mu = a.mean(axis=0)
    cov = np.cov(a.T, ddof=0)
    inv = np.linalg.inv(cov)
    d = a - mu
    return [float(x @ inv @ x) for x in d]


def test_mahalanobis_numpy_parity(spark):
    rng = random.Random(5)
    pts = []
    for _ in range(300):
        x = rng.gauss(10, 2)
        pts.append((x, 0.7 * x + rng.gauss(0, 1)))  # correlated cloud
    rows = [(i, "g", x, y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "event_id long, g string, x double, y double")
    got = {r["event_id"]: r["d2"] for r in mahalanobis_2d(df, "g", "x", "y").collect()}
    ref = _maha_ref(pts)
    for i, want in enumerate(ref):
        assert got[i] == pytest.approx(want, rel=1e-6)


def test_mahalanobis_catches_joint_outlier(spark):
    # x and y each in-band marginally, but the pair sits OFF the strong
    # x~y correlation axis — univariate z-scores stay small, d2 fires
    rng = random.Random(9)
    rows = []
    for i in range(500):
        x = rng.gauss(0, 1)
        rows.append((i, "g", x, x + rng.gauss(0, 0.05)))
    rows.append((999, "g", 1.5, -1.5))  # |z| = 1.5 in each margin
    df = spark.createDataFrame(rows, "event_id long, g string, x double, y double")
    out = {r["event_id"]: r for r in mahalanobis_2d(df, "g", "x", "y").collect()}
    assert out[999]["is_outlier"] is True
    xs = [r[2] for r in rows]
    z = abs(1.5 - np.mean(xs)) / np.std(xs)
    assert z < 2.0  # the margin really is unremarkable


def test_mahalanobis_degenerate_groups(spark):
    rows = [
        # constant y: singular covariance
        (1, "const", 1.0, 5.0), (2, "const", 2.0, 5.0), (3, "const", 3.0, 5.0),
        # 2-point group: rank-1 covariance
        (4, "two", 1.0, 1.0), (5, "two", 2.0, 3.0),
        # NULL feature rows are excluded entirely
        (6, "ok", 1.0, None), (7, "ok", 1.0, 2.0), (8, "ok", 2.0, 1.0),
        (9, "ok", 3.0, 3.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, g string, x double, y double")
    out = mahalanobis_2d(df, "g", "x", "y")
    rows_out = {r["event_id"]: r for r in out.collect()}
    assert 6 not in rows_out
    for i in (1, 2, 3, 4, 5):
        assert rows_out[i]["d2"] is None and rows_out[i]["is_outlier"] is None
    assert all(rows_out[i]["d2"] is not None for i in (7, 8, 9))


def test_mahalanobis_empty(spark):
    df = spark.createDataFrame([], "event_id long, g string, x double, y double")
    assert mahalanobis_2d(df, "g", "x", "y").count() == 0


# ---------------------------------------------------------- weighted quantile


def _wq_ref(vw: list[tuple[float, float]], q: float) -> float:
    vw = sorted((v, w) for v, w in vw if w and w > 0)
    tot = sum(w for _, w in vw)
    c = 0.0
    for v, w in vw:
        c += w
        if c >= q * tot:
            return v
    return vw[-1][0]


def test_weighted_quantile_reference_parity(spark):
    rng = random.Random(13)
    data = {
        "a": [(rng.uniform(0, 100), rng.uniform(0.1, 5)) for _ in range(200)],
        "b": [(rng.uniform(0, 10), float(rng.randint(1, 3))) for _ in range(50)],
    }
    rows = [(g, v, w) for g, vw in data.items() for v, w in vw]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    out = weighted_quantiles(df, "g", "v", "w", qs=(0.25, 0.5, 0.75))
    got = {(r["g"], r["q"]): r["wq"] for r in out.collect()}
    for g, vw in data.items():
        for q in (0.25, 0.5, 0.75):
            assert got[(g, q)] == pytest.approx(_wq_ref(vw, q), abs=1e-12), (g, q)


def test_weighted_quantile_mass_pull_and_equal_weights(spark):
    # one giant-weight row owns >half the mass: it IS the weighted median
    rows = [("g", float(v), 1.0) for v in range(1, 10)] + [("g", 42.0, 100.0)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    got = {r["q"]: r["wq"] for r in weighted_quantiles(df, "g", "v", "w").collect()}
    assert got[0.5] == 42.0
    # equal weights reduce to the lower empirical quantile
    eq = spark.createDataFrame(
        [("e", float(v), 1.0) for v in range(1, 11)], "g string, v double, w double"
    )
    got_eq = {r["q"]: r["wq"] for r in weighted_quantiles(eq, "g", "v", "w").collect()}
    assert got_eq[0.5] == 5.0 and got_eq[0.25] == 3.0


def test_weighted_quantile_guards(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 0.0), ("g", 2.0, None), ("g", 3.0, 1.0)],
        "g string, v double, w double",
    )
    got = {r["q"]: r for r in weighted_quantiles(df, "g", "v", "w").collect()}
    # zero/NULL weights carry no mass: the only massive row is v=3
    assert got[0.5]["wq"] == 3.0 and got[0.5]["total_w"] == 1.0
    with pytest.raises(ValueError):
        weighted_quantiles(df, "g", "v", "w", qs=(0.0,))
    empty = spark.createDataFrame([], "g string, v double, w double")
    assert weighted_quantiles(empty, "g", "v", "w").count() == 0


# ----------------------------------------------------------------- freshness


def _ts(day: int, hour: int, minute: int = 0):
    return dt.datetime(2024, 3, day, hour, minute)


def test_freshness_staleness_and_recent_share(spark):
    rows = []
    # live feed: hourly rows up to day 3 10:30 (the corpus watermark)
    for h in range(48):
        rows.append(("live", _ts(1, 0) + dt.timedelta(hours=h)))
    rows.append(("live", _ts(3, 10, 30)))
    # dead feed: stopped at day 2 06:00 — 28.5h before the watermark
    for h in range(10):
        rows.append(("dead", _ts(2, 6) - dt.timedelta(hours=h)))
    df = spark.createDataFrame(rows, "g string, ts timestamp")
    out = {r["g"]: r for r in freshness(df, "g", "ts", recent_hours=24).collect()}
    assert out["dead"]["staleness_sec"] == pytest.approx(28.5 * 3600)
    assert out["live"]["staleness_sec"] == 0.0
    # recent = hour buckets strictly after (wm − 24h = day 2 10:30), i.e.
    # buckets 11:00 day 2 .. 10:00 day 3: the live feed has hours 35..47
    # of its ramp (13 rows) + the watermark row
    assert out["live"]["n_recent"] == 14
    assert out["dead"]["n_recent"] == 0
    assert out["dead"]["recent_share"] == 0.0


def test_freshness_single_group_and_empty(spark):
    df = spark.createDataFrame([("g", _ts(1, 5))], "g string, ts timestamp")
    row = freshness(df, "g", "ts").collect()[0]
    assert row["staleness_sec"] == 0.0 and row["recent_share"] == pytest.approx(1.0)
    empty = spark.createDataFrame([], "g string, ts timestamp")
    assert freshness(empty, "g", "ts").count() == 0
