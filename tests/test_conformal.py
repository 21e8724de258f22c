"""Split-conformal p-values (operators/conformal.py) vs a brute-force
reference, plus the finite-sample validity guarantee itself."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.conformal import conformal_pvalues


def _mk(calib, scored, group="a"):
    rows = [{"g": group, "v": float(x), "s": 0} for x in calib]
    rows += [{"g": group, "v": float(x), "s": 1} for x in scored]
    return pd.DataFrame(rows)


def _p_ref(calib, v):
    calib = np.asarray(calib, dtype=float)
    return round(
        (1.0 + (calib >= v).sum()) / (len(calib) + 1.0) + 1e-9, 6
    )


def test_matches_brute_force_with_ties(spark):
    rng = np.random.default_rng(2)
    calib = np.round(rng.normal(10, 3, 200), 1)  # rounding makes ties
    scored = np.round(rng.normal(10, 3, 150), 1)
    df = spark.createDataFrame(_mk(calib, scored)).repartition(7)
    out = conformal_pvalues(df, "g", "v", "s").collect()
    assert sum(r["n_scored_at"] for r in out) == 150
    for r in out:
        assert r["p_value"] == pytest.approx(_p_ref(calib, r["v"]), abs=2e-6)
        assert r["n_calib"] == 200


def test_finite_sample_validity(spark):
    """The conformal guarantee: under exchangeability the flag rate is
    <= alpha (up to binomial noise) for a FAT-TAILED distribution the
    Gaussian scorer would mis-calibrate on."""
    rng = np.random.default_rng(8)
    calib = rng.pareto(1.5, 2000)  # infinite-variance tail
    scored = rng.pareto(1.5, 2000)
    df = spark.createDataFrame(_mk(calib, scored))
    out = conformal_pvalues(df, "g", "v", "s", alpha=0.05).collect()
    flagged = sum(r["n_scored_at"] for r in out if r["is_anomalous"])
    rate = flagged / 2000.0
    assert rate <= 0.05 + 0.02  # alpha + 4 binomial sigmas


def test_planted_anomalies_flagged(spark):
    rng = np.random.default_rng(4)
    calib = rng.normal(0, 1, 500)
    scored = np.concatenate([rng.normal(0, 1, 95), [50.0] * 5])
    df = spark.createDataFrame(_mk(calib, scored))
    out = {r["v"]: r for r in conformal_pvalues(df, "g", "v", "s").collect()}
    r = out[50.0]
    assert r["p_value"] == pytest.approx(1.0 / 501.0, abs=2e-6)
    assert r["is_anomalous"] is True and r["n_scored_at"] == 5


def test_empty_calibration_is_vacuous(spark):
    df = spark.createDataFrame(_mk([], [1.0, 2.0, 3.0]))
    out = conformal_pvalues(df, "g", "v", "s").collect()
    assert all(r["p_value"] == 1.0 and not r["is_anomalous"] for r in out)
    assert all(r["n_calib"] == 0 for r in out)


def test_group_independence_and_determinism(spark):
    pdf = pd.concat(
        [_mk([1, 2, 3, 4], [10.0], "hot"), _mk([10, 20, 30, 40], [10.0], "cold")]
    )
    df = spark.createDataFrame(pdf)
    for _ in range(2):
        out = {
            r["g"]: r
            for r in conformal_pvalues(
                df.repartition(5), "g", "v", "s"
            ).collect()
        }
        assert out["hot"]["p_value"] == pytest.approx(1 / 5, abs=1e-6)
        assert out["cold"]["p_value"] == pytest.approx(5 / 5, abs=1e-6)
