"""Mann–Kendall trend test and histogram spike detector
(operators/stattests.py) vs hand-rolled numpy references."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import (
    histogram_spikes,
    mann_kendall,
)

T0 = dt.datetime(2024, 1, 1)


def _events(counts, group="a"):
    """One row per event; hour i gets counts[i] rows (0 = gap hour)."""
    rows = []
    for i, c in enumerate(counts):
        ts = T0 + dt.timedelta(hours=i)
        rows += [{"g": group, "ts": ts}] * int(c)
    return pd.DataFrame(rows)


def _mk_ref(counts):
    """Textbook MK over the dense series (tie-corrected, continuity z)."""
    x = np.asarray(counts, dtype=float)
    n = len(x)
    s = 0
    for i in range(n):
        for j in range(i + 1, n):
            s += np.sign(x[j] - x[i])
    _, t = np.unique(x, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5) - (t * (t - 1) * (2 * t + 5)).sum()) / 18
    if var <= 0:
        return int(s), None
    if s > 0:
        z = (s - 1) / np.sqrt(var)
    elif s < 0:
        z = (s + 1) / np.sqrt(var)
    else:
        z = 0.0
    return int(s), float(z)


class TestMannKendall:
    def test_monotone_increase_detected(self, spark):
        counts = list(range(1, 25))  # strictly rising hourly volume
        out = mann_kendall(spark.createDataFrame(_events(counts)), "g", "ts")
        row = out.collect()[0]
        s_ref, z_ref = _mk_ref(counts)
        assert row["n_buckets"] == 24
        assert row["s"] == s_ref
        assert row["z"] == pytest.approx(z_ref, abs=1e-5)
        assert row["trend"] == "increasing"

    def test_decay_with_ties_matches_reference(self, spark):
        counts = [9, 9, 8, 8, 7, 7, 6, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1, 1]
        out = mann_kendall(spark.createDataFrame(_events(counts)), "g", "ts")
        row = out.collect()[0]
        s_ref, z_ref = _mk_ref(counts)
        assert (row["s"], row["n_buckets"]) == (s_ref, 18)
        assert row["z"] == pytest.approx(z_ref, abs=1e-5)
        assert row["trend"] == "decreasing"

    def test_gap_hours_count_zero(self, spark):
        # hours 0 and 4 populated, 1-3 silent: dense series [5,0,0,0,5]
        df = spark.createDataFrame(_events([5, 0, 0, 0, 5]))
        row = mann_kendall(df, "g", "ts").collect()[0]
        s_ref, z_ref = _mk_ref([5, 0, 0, 0, 5])
        assert row["n_buckets"] == 5  # grid, not observed buckets
        assert row["s"] == s_ref and row["trend"] == "none"

    def test_constant_series_null_z(self, spark):
        df = spark.createDataFrame(_events([4] * 10))
        row = mann_kendall(df, "g", "ts").collect()[0]
        assert row["s"] == 0 and row["z"] is None and row["trend"] == "none"

    def test_flat_noise_not_flagged(self, spark):
        rng = np.random.default_rng(7)
        counts = rng.integers(5, 15, size=48).tolist()
        row = mann_kendall(
            spark.createDataFrame(_events(counts)), "g", "ts"
        ).collect()[0]
        s_ref, z_ref = _mk_ref(counts)
        assert row["s"] == s_ref
        assert row["z"] == pytest.approx(z_ref, abs=1e-5)

    def test_groups_independent(self, spark):
        df = spark.createDataFrame(
            pd.concat(
                [_events(list(range(1, 25)), "up"),
                 _events(list(range(24, 0, -1)), "down")]
            )
        )
        out = {r["g"]: r["trend"] for r in mann_kendall(df, "g", "ts").collect()}
        assert out == {"up": "increasing", "down": "decreasing"}


class TestHistogramSpikes:
    def _values(self):
        # smooth-ish mass in buckets 0..5 plus a clip pile at 100..103
        # (bucket 6 with width 16 has a hole before the spike bucket)
        vals = []
        for b in range(6):
            vals += [b * 16 + 3] * (20 - 2 * b)
        vals += [100] * 200  # bucket 6 — the truncation pile
        return pd.DataFrame({"v": vals})

    def test_spike_flagged_and_neighbors_not(self, spark):
        out = histogram_spikes(
            spark.createDataFrame(self._values()), "v", width=16
        ).toPandas().set_index("bucket")
        assert bool(out.loc[6, "is_spike"])
        assert not out.drop(index=6)["is_spike"].any()
        # neighbor counts feeding the flagged ratio are the dense ones
        assert out.loc[6, "prev_n"] == 10 and out.loc[6, "next_n"] == 0
        assert out.loc[6, "ratio"] == pytest.approx(20.0, abs=1e-6)

    def test_dense_grid_fills_holes(self, spark):
        df = spark.createDataFrame(pd.DataFrame({"v": [0, 0, 64]}))
        out = histogram_spikes(df, "v", width=16).toPandas()
        assert sorted(out["bucket"]) == [0, 1, 2, 3, 4]
        assert out.set_index("bucket").loc[2, "n"] == 0

    def test_min_count_gate(self, spark):
        # a towering ratio on 3 rows stays unflagged (n < min_count)
        df = spark.createDataFrame(
            pd.DataFrame({"v": [3] * 1 + [35] * 3})
        )
        out = histogram_spikes(df, "v", width=16, min_count=10).toPandas()
        assert not out["is_spike"].any()

    def test_expression_value_col(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            pd.DataFrame({"text": ["a b c", "a b", "x " * 200]})
        )
        from htm_streamer_spark.operators.textstats import token_count_col

        out = histogram_spikes(df, token_count_col("text"), width=16)
        assert out.count() >= 1
