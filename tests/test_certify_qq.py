"""Hoeffding violation-rate certificate (operators/certify.py) and
quantile QQ drift (operators/stattests.py) vs hand references."""

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.certify import violation_rate_certificate
from htm_streamer_spark.operators.stattests import quantile_qq_drift


def _in_sample(doc_id, permille=200):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return h % 2147483647 % 1000 < permille


class TestViolationCertificate:
    def _df(self, spark, n=2000, bad_every=10):
        pdf = pd.DataFrame(
            {
                "doc_id": range(n),
                "v": [i % bad_every == 0 for i in range(n)],
            }
        )
        return spark.createDataFrame(pdf), pdf

    def test_counts_match_hash_sample(self, spark):
        df, pdf = self._df(spark)
        out = violation_rate_certificate(
            df, {"bad": F.col("v")}, id_col="doc_id",
            sample_permille=200, delta=0.01,
        ).collect()[0]
        mask = pdf["doc_id"].map(_in_sample)
        assert out["n_sampled"] == int(mask.sum())
        assert out["n_violations"] == int(pdf.loc[mask, "v"].sum())

    def test_bound_is_valid_and_formula_exact(self, spark):
        df, pdf = self._df(spark)
        out = violation_rate_certificate(
            df, {"bad": F.col("v")}, id_col="doc_id",
            sample_permille=200, delta=0.01,
        ).collect()[0]
        n, v = out["n_sampled"], out["n_violations"]
        ub_ref = min(v / n + math.sqrt(math.log(1 / 0.01) / (2 * n)), 1.0)
        assert out["upper_bound"] == pytest.approx(ub_ref, abs=1e-6)
        # the certificate covers the TRUE rate on this fixture
        true_rate = pdf["v"].mean()
        assert true_rate <= out["upper_bound"]

    def test_multiple_checks_share_one_sample(self, spark):
        df, _ = self._df(spark)
        out = violation_rate_certificate(
            df,
            {"a": F.col("v"), "b": ~F.col("v"), "never": F.lit(False)},
            id_col="doc_id",
        ).toPandas().set_index("check_id")
        assert out["n_sampled"].nunique() == 1
        assert out.loc["never", "n_violations"] == 0
        assert out.loc["never", "rate"] == 0.0
        # complementary checks partition the sample
        assert (
            out.loc["a", "n_violations"] + out.loc["b", "n_violations"]
            == out.loc["a", "n_sampled"]
        )

    def test_full_sample_is_exact_census(self, spark):
        df, pdf = self._df(spark, n=500)
        out = violation_rate_certificate(
            df, {"bad": F.col("v")}, id_col="doc_id", sample_permille=1000
        ).collect()[0]
        assert out["n_sampled"] == 500
        assert out["rate"] == pytest.approx(pdf["v"].mean(), abs=1e-6)

    def test_param_validation(self, spark):
        df, _ = self._df(spark, n=10)
        with pytest.raises(ValueError):
            violation_rate_certificate(df, {"a": F.col("v")}, sample_permille=0)
        with pytest.raises(ValueError):
            violation_rate_certificate(df, {"a": F.col("v")}, delta=1.5)

    def test_deterministic_rerun(self, spark):
        df, _ = self._df(spark)
        a = violation_rate_certificate(df, {"bad": F.col("v")}).collect()
        b = violation_rate_certificate(
            df.repartition(7), {"bad": F.col("v")}
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))


class TestQuantileQQDrift:
    def test_matches_numpy_deciles(self, spark):
        rng = np.random.default_rng(2)
        pdf = pd.DataFrame(
            {
                "g": ["a"] * 400 + ["b"] * 400,
                "x": np.concatenate(
                    [rng.normal(100, 10, 400), rng.normal(130, 10, 400)]
                ).round(3),
            }
        )
        out = (
            quantile_qq_drift(spark.createDataFrame(pdf), "g", "x")
            .toPandas()
            .set_index("g")
        )
        probs = np.arange(0.1, 0.95, 0.1)
        qg = np.quantile(pdf["x"], probs)  # linear interpolation default
        for g in ("a", "b"):
            qs = np.quantile(pdf.loc[pdf["g"] == g, "x"], probs)
            assert out.loc[g, "qq_dist"] == pytest.approx(
                np.abs(qs - qg).max(), abs=1e-5
            )
        # the shifted group is ~15 units from the pooled deciles
        assert out.loc["b", "qq_dist"] > 10

    def test_identical_group_zero_distance(self, spark):
        pdf = pd.DataFrame({"g": ["only"] * 100, "x": np.arange(100.0)})
        out = quantile_qq_drift(spark.createDataFrame(pdf), "g", "x")
        assert out.collect()[0]["qq_dist"] == pytest.approx(0.0, abs=1e-6)
