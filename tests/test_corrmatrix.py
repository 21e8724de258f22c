"""One-pass correlation matrix (operators/corrmatrix.py): numpy
parity, pairwise-complete null handling, degenerate-pair NULL, and
the single-scan/single-agg plan."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import numpy as np
import pandas as pd

from htm_streamer_spark.operators.corrmatrix import correlation_matrix


def _pdf(seed=3, n=500):
    rng = np.random.default_rng(seed)
    x = rng.normal(0, 1, n)
    return pd.DataFrame(
        {
            "x": x,
            "y": 2 * x + rng.normal(0, 0.5, n),   # strongly correlated
            "z": rng.normal(5, 2, n),             # independent
        }
    )


def test_matches_numpy_corrcoef(spark):
    pdf = _pdf()
    got = {
        (r["col_a"], r["col_b"]): r["r"]
        for r in correlation_matrix(spark.createDataFrame(pdf), ["x", "y", "z"]).collect()
    }
    c = np.corrcoef(pdf.to_numpy().T)
    assert abs(got[("x", "y")] - c[0, 1]) < 1e-9
    assert abs(got[("x", "z")] - c[0, 2]) < 1e-9
    assert abs(got[("y", "z")] - c[1, 2]) < 1e-9
    assert got[("x", "y")] > 0.9


def test_pairwise_deletion_on_nulls(spark):
    pdf = _pdf(seed=9, n=200)
    pdf.loc[:49, "z"] = np.nan  # z sparse; x-y pair must be untouched
    rows = {
        (r["col_a"], r["col_b"]): r
        for r in correlation_matrix(spark.createDataFrame(pdf), ["x", "y", "z"]).collect()
    }
    assert rows[("x", "y")]["n"] == 200
    assert rows[("x", "z")]["n"] == 150
    sub = pdf.dropna()
    want = np.corrcoef(sub["x"], sub["z"])[0, 1]
    assert abs(rows[("x", "z")]["r"] - want) < 1e-9


def test_constant_column_gives_null_not_zero(spark):
    pdf = _pdf(seed=1, n=100)
    pdf["c"] = 7.0
    rows = {
        (r["col_a"], r["col_b"]): r["r"]
        for r in correlation_matrix(spark.createDataFrame(pdf), ["x", "c"]).collect()
    }
    assert rows[("x", "c")] is None


def test_single_scan_single_aggregate_plan(spark, tmp_path):
    path = str(tmp_path / "corr_src")
    spark.createDataFrame(_pdf()).write.parquet(path)
    plan_df = correlation_matrix(spark.read.parquet(path), ["x", "y", "z"])
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    import re

    # exactly one parquet scan feeds all C(k,2) pairs' power sums
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    # one partial + one final HashAggregate round, nothing per-pair
    # (each node appears twice in formatted output: tree + detail)
    assert len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M)) == 2
    assert "Exchange" in plan  # single reduce round to one partition
