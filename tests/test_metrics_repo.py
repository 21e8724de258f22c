"""Metrics repository (operators/metrics_repo.py): one-pass cube
profile + cross-run regression gate over the atomic catalog."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.metrics_repo import (
    GLOBAL_SEGMENT,
    MetricsRepository,
    profile_metrics,
)
from htm_streamer_spark.sources.table_io import ManifestCatalog


def _docs(spark, mean_b=10.0, with_nulls=False, drop_seg=None):
    rows = []
    for i in range(200):
        seg = "a" if i % 2 == 0 else "b"
        if seg == drop_seg:
            continue
        v = float(i % 5) if seg == "a" else mean_b + (i % 3)
        if with_nulls and seg == "b" and i % 4 == 1:
            v = None
        rows.append((seg, v))
    return spark.createDataFrame(rows, "seg string, v double")


def test_profile_metrics_values_and_levels(spark):
    df = _docs(spark)
    prof = {
        (r["metric"], r["segment"]): r["value"]
        for r in profile_metrics(df, "seg", ["v"]).collect()
    }
    assert prof[("row_count", GLOBAL_SEGMENT)] == 200.0
    assert prof[("row_count", "a")] == 100.0
    assert prof[("mean_v", "a")] == pytest.approx(2.0)  # 0..4 cycle
    assert prof[("null_rate_v", GLOBAL_SEGMENT)] == 0.0
    # one aggregation pass: a single scan of the source in the plan
    plan = profile_metrics(df, "seg", ["v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 1


def test_regression_flags_only_the_drifted_metric(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    repo.save(profile_metrics(_docs(spark), "seg", ["v"]), run_id=1)
    repo.save(
        profile_metrics(_docs(spark, mean_b=20.0), "seg", ["v"]), run_id=2
    )
    out = {
        (r["metric"], r["segment"]): r["status"]
        for r in repo.regressions(spark, run_id=2).collect()
    }
    assert out[("mean_v", "b")] == "breach"
    assert out[("mean_v", GLOBAL_SEGMENT)] == "breach"  # b moves global
    assert out[("mean_v", "a")] == "ok"
    assert out[("row_count", "a")] == "ok"


def test_regression_null_rate_creep(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    repo.save(profile_metrics(_docs(spark), "seg", ["v"]), run_id=1)
    repo.save(
        profile_metrics(_docs(spark, with_nulls=True), "seg", ["v"]),
        run_id=2,
    )
    out = {
        (r["metric"], r["segment"]): r
        for r in repo.regressions(spark, run_id=2).collect()
    }
    assert out[("null_rate_v", "b")]["status"] == "breach"
    assert out[("null_rate_v", "b")]["prev_value"] == 0.0
    assert out[("null_rate_v", "a")]["status"] == "ok"


def test_vanished_segment_reports_gone(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    repo.save(profile_metrics(_docs(spark), "seg", ["v"]), run_id=1)
    repo.save(
        profile_metrics(_docs(spark, drop_seg="b"), "seg", ["v"]), run_id=2
    )
    out = {
        (r["metric"], r["segment"]): r["status"]
        for r in repo.regressions(spark, run_id=2).collect()
    }
    assert out[("mean_v", "b")] == "gone"
    assert out[("row_count", "b")] == "gone"
    # and a re-appearing segment in run 3 is 'new' vs run 2
    repo.save(profile_metrics(_docs(spark), "seg", ["v"]), run_id=3)
    out3 = {
        (r["metric"], r["segment"]): r["status"]
        for r in repo.regressions(spark, run_id=3).collect()
    }
    assert out3[("mean_v", "b")] == "new"


def test_no_prior_run_is_empty_not_crash(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    assert repo.regressions(spark, run_id=1).count() == 0
    repo.save(profile_metrics(_docs(spark), "seg", ["v"]), run_id=1)
    assert repo.regressions(spark, run_id=1).count() == 0  # no run < 1


def test_diffs_against_latest_prior_not_first(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    repo.save(profile_metrics(_docs(spark, mean_b=10.0), "seg", ["v"]), 1)
    repo.save(profile_metrics(_docs(spark, mean_b=20.0), "seg", ["v"]), 2)
    repo.save(profile_metrics(_docs(spark, mean_b=20.0), "seg", ["v"]), 3)
    out = {
        (r["metric"], r["segment"]): r["status"]
        for r in repo.regressions(spark, run_id=3).collect()
    }
    # vs run 2 (identical) everything is ok; vs run 1 it would breach
    assert out[("mean_v", "b")] == "ok"


def test_tolerances_respected(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    repo.save(profile_metrics(_docs(spark, mean_b=10.0), "seg", ["v"]), 1)
    repo.save(profile_metrics(_docs(spark, mean_b=10.8), "seg", ["v"]), 2)
    loose = repo.regressions(spark, run_id=2, rel_tol=0.20).collect()
    tight = repo.regressions(spark, run_id=2, rel_tol=0.01).collect()
    loose_b = {r["metric"]: r["status"] for r in loose if r["segment"] == "b"}
    tight_b = {r["metric"]: r["status"] for r in tight if r["segment"] == "b"}
    assert loose_b["mean_v"] == "ok"
    assert tight_b["mean_v"] == "breach"


def _save_runs(spark, repo, series):
    """series: list of (run_id, mean_b-ish value) — store one metric."""
    for rid, val in series:
        df = spark.createDataFrame(
            [("m", "s", float(val))], "metric string, segment string, value double"
        )
        repo.save(df, run_id=rid)


def test_control_chart_flags_jump_after_stable_history(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    noise = [10.0, 10.2, 9.9, 10.1, 10.0, 9.8, 10.1]
    _save_runs(spark, repo, list(enumerate(noise, start=1)))
    repo.save(
        spark.createDataFrame(
            [("m", "s", 14.0)], "metric string, segment string, value double"
        ),
        run_id=8,
    )
    out = repo.control_chart(spark, run_id=8).collect()[0]
    assert out["status"] == "anomaly"
    assert 9.5 < out["forecast"] < 10.5
    # a same-noise value is ok
    repo.save(
        spark.createDataFrame(
            [("m", "s", 10.15)], "metric string, segment string, value double"
        ),
        run_id=9,
    )
    out9 = [
        r for r in repo.control_chart(spark, run_id=9).collect()
    ][0]
    assert out9["status"] == "ok"


def test_control_chart_catches_slow_drift_regressions_misses(spark, tmp_path):
    # +4% per run: the single-prev-run gate at 10% rel_tol never fires,
    # but the cumulative move away from the EWMA of a long stable
    # prefix does
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    vals = [10.0] * 6 + [10.0 * 1.04 ** i for i in range(1, 6)]
    _save_runs(spark, repo, list(enumerate(vals, start=1)))
    rid = len(vals)
    reg = {
        (r["metric"], r["segment"]): r["status"]
        for r in repo.regressions(spark, run_id=rid).collect()
    }
    assert reg[("m", "s")] == "ok"  # blind to the drift
    cc = repo.control_chart(spark, run_id=rid).collect()[0]
    # the adaptive EWMA follows the drift (and the drift inflates its
    # own residual sigma), so the jump gate stays quiet — the fixed
    # early-anchor gate is what fires
    assert cc["status"] == "drift"
    assert cc["anchor_mean"] == pytest.approx(10.0)


def test_control_chart_insufficient_history(spark, tmp_path):
    repo = MetricsRepository(ManifestCatalog(tmp_path / "cat"))
    _save_runs(spark, repo, [(1, 10.0), (2, 99.0)])
    out = repo.control_chart(spark, run_id=2).collect()[0]
    assert out["status"] == "insufficient_history"
