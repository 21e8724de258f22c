"""Two-sample energy distance (operators/stattests.py energy_distance)
vs the O(n^2) pairwise-definition numpy reference."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import energy_distance


def _energy_ref(x, y):
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    a = np.abs(x[:, None] - y[None, :]).mean()
    b = np.abs(x[:, None] - x[None, :]).mean()
    c = np.abs(y[:, None] - y[None, :]).mean()
    return float(2 * a - b - c)


def _df(spark, groups):
    rows = []
    for g, (xa, xb) in groups.items():
        rows += [{"g": g, "v": float(v), "s": 0} for v in xa]
        rows += [{"g": g, "v": float(v), "s": 1} for v in xb]
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(7)


def test_energy_matches_pairwise_reference(spark):
    rng = np.random.default_rng(3)
    groups = {
        "same": (rng.normal(0, 1, 80), rng.normal(0, 1, 90)),
        "shift": (rng.normal(0, 1, 70), rng.normal(2, 1, 60)),
        "scale": (rng.normal(0, 1, 80), rng.normal(0, 3, 80)),
        "ties": (rng.integers(0, 5, 100), rng.integers(0, 5, 120)),
    }
    out = {
        r["g"]: r
        for r in energy_distance(_df(spark, groups), "g", "v", "s").collect()
    }
    for g, (xa, xb) in groups.items():
        assert out[g]["n_a"] == len(xa) and out[g]["n_b"] == len(xb)
        assert out[g]["energy"] == pytest.approx(
            _energy_ref(xa, xb), abs=2e-6
        ), g
    # omnibus sensitivity: the variance-only change must register
    assert out["scale"]["energy"] > 0.3
    assert out["shift"]["energy"] > out["same"]["energy"]


def test_energy_identical_samples_is_zero_and_point_masses_two(spark):
    v = list(np.linspace(0, 9, 40))
    out = {
        r["g"]: r["energy"]
        for r in energy_distance(
            _df(spark, {"id": (v, v), "pm": ([0.0] * 30, [1.0] * 50)}),
            "g",
            "v",
            "s",
        ).collect()
    }
    assert out["id"] == pytest.approx(0.0, abs=1e-6)
    # delta_0 vs delta_1: E = 2*1 - 0 - 0
    assert out["pm"] == pytest.approx(2.0, abs=1e-6)


def test_energy_single_sample_group_null_and_empty(spark):
    df = _df(spark, {"only_a": ([1.0, 2.0, 3.0], [])})
    rows = energy_distance(df, "g", "v", "s").collect()
    assert len(rows) == 1
    assert rows[0]["n_b"] == 0 and rows[0]["energy"] is None
    empty = energy_distance(df.where("v > 99"), "g", "v", "s")
    assert empty.count() == 0


def test_energy_null_values_dropped(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 6,
            "v": [1.0, 2.0, None, 5.0, 6.0, None],
            "s": [0, 0, 0, 1, 1, 1],
        }
    )
    df = spark.createDataFrame(pdf)
    r = energy_distance(df, "g", "v", "s").collect()[0]
    assert (r["n_a"], r["n_b"]) == (2, 2)
    assert r["energy"] == pytest.approx(
        _energy_ref([1.0, 2.0], [5.0, 6.0]), abs=2e-6
    )
