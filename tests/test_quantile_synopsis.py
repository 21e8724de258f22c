"""quantile_synopsis (operators/binning.py): deterministic
uniform-by-hash sample quantiles with the distribution-free DKW bound
— sampled set is layout-independent, the bound actually holds against
the exact quantiles, and the published epsilon matches the formula."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from htm_streamer_spark.operators.binning import quantile_synopsis

SF_DIR = "/root/testdata/sf0.01"


def test_partitioning_invariance(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    a = (
        quantile_synopsis(ev, "value", "event_id", group_col="event_type")
        .orderBy("event_type")
        .collect()
    )
    b = (
        quantile_synopsis(
            ev.repartition(23), "value", "event_id", group_col="event_type"
        )
        .orderBy("event_type")
        .collect()
    )
    assert a == b


def test_dkw_bound_holds_against_exact_cdf(spark):
    # DKW: sup_x |F_m(x) - F(x)| <= eps w.p. 1-delta. Equivalent check
    # at the sampled quantile q_p: the TRUE CDF evaluated at q_p must
    # be within eps of p. Deterministic fixture + hash -> this either
    # holds forever or never; it holds.
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    syn = quantile_synopsis(
        ev, "value", "event_id", group_col="event_type", rate_den=8
    ).collect()
    total = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for row in syn:
        et, eps = row["event_type"], row["dkw_eps"]
        for p, qcol in ((0.25, "q0_25"), (0.5, "q0_5"), (0.75, "q0_75"), (0.9, "q0_9")):
            below = ev.filter(
                (F.col("event_type") == et) & (F.col("value") <= row[qcol])
            ).count()
            assert abs(below / total[et] - p) <= eps + 1e-9, (et, p)


def test_eps_matches_formula_and_shrinks_with_rate(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    coarse = quantile_synopsis(
        ev, "value", "event_id", group_col="event_type", rate_den=32
    ).collect()
    fine = {
        r["event_type"]: r
        for r in quantile_synopsis(
            ev, "value", "event_id", group_col="event_type", rate_den=4
        ).collect()
    }
    for r in coarse:
        want = math.sqrt(math.log(2 / 0.05) / (2 * r["n_sample"])) + 1e-9
        assert abs(r["dkw_eps"] - round(want, 6)) < 1e-12
        f = fine[r["event_type"]]
        assert f["n_sample"] > r["n_sample"]
        assert f["dkw_eps"] < r["dkw_eps"]


def test_sample_rate_is_roughly_honored(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n = ev.count()
    m = sum(
        r["n_sample"]
        for r in quantile_synopsis(
            ev, "value", "event_id", group_col="event_type", rate_den=8
        ).collect()
    )
    assert abs(m / n - 1 / 8) < 0.02  # md5 uniformity


def test_empty_input(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(F.lit(False))
    assert quantile_synopsis(ev, "value", "event_id", group_col="event_type").count() == 0
