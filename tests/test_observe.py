"""Observation metrics: collected on the SAME pass as the real
output — values match direct aggregation, and the plan shows one scan
plus a CollectMetrics node (no second job)."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from htm_streamer_spark.operators.observe import with_observed_metrics


def _df(spark):
    rows = [(i, 1 if i % 3 == 0 else 0, float(i)) for i in range(90)]
    return spark.createDataFrame(rows, "doc_id long, bad int, v double")


def test_metrics_match_direct_aggregation(spark):
    observed, obs = with_observed_metrics(
        _df(spark),
        flag_col="bad",
        extra={"v_sum": F.round(F.sum("v"), 6)},
    )
    out = observed.where(F.col("bad") == 0).count()  # the real action
    m = obs.get
    assert m["n_rows"] == 90          # observed BEFORE the filter
    assert m["n_flagged"] == 30
    assert abs(m["v_sum"] - sum(float(i) for i in range(90))) < 1e-6
    assert out == 60


def test_single_scan_with_collect_metrics_node(spark, tmp_path):
    path = str(tmp_path / "obs_docs")
    _df(spark).write.parquet(path)
    observed, obs = with_observed_metrics(spark.read.parquet(path), flag_col="bad")
    buf = io.StringIO()
    with redirect_stdout(buf):
        observed.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "CollectMetrics" in plan


def test_metrics_on_empty_frame(spark):
    observed, obs = with_observed_metrics(
        _df(spark).where(F.lit(False)), flag_col="bad"
    )
    observed.count()
    assert obs.get["n_rows"] == 0
