"""Hill-number diversity profile (lm.diversity_profile) and Tukey
fences (extremes.tukey_fences) vs literal numpy/pandas references."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.extremes import tukey_fences
from htm_streamer_spark.operators.lm import diversity_profile


def _diversity_ref(texts):
    c = Counter(w for t in texts for w in t.lower().split())
    n = sum(c.values())
    ps = np.array(list(c.values())) / n
    h = float(-(ps * np.log(ps)).sum())
    return n, len(c), math.exp(h), 1.0 / float((ps * ps).sum()), h


def test_diversity_profile_matches_reference_and_ordering(spark):
    docs = pd.DataFrame(
        {
            "source": ["a"] * 2 + ["b"],
            "text": [
                "the cat sat on the mat the end",
                "cat cat cat dog",
                "uniform words here now",
            ],
        }
    )
    got = (
        diversity_profile(spark.createDataFrame(docs), "source")
        .orderBy("source")
        .toPandas()
        .set_index("source")
    )
    n, d0, d1, d2, h = _diversity_ref(docs[docs.source == "a"]["text"])
    assert int(got.loc["a", "n_tokens"]) == n
    assert int(got.loc["a", "d0"]) == d0
    assert got.loc["a", "d1"] == pytest.approx(d1, abs=1e-6)
    assert got.loc["a", "d2"] == pytest.approx(d2, abs=1e-6)
    assert got.loc["a", "shannon"] == pytest.approx(h, abs=1e-6)
    assert got.loc["a", "pielou_j"] == pytest.approx(h / math.log(d0), abs=1e-6)
    # Hill ordering D0 >= D1 >= D2 always
    for s in ("a", "b"):
        assert got.loc[s, "d0"] >= got.loc[s, "d1"] >= got.loc[s, "d2"] - 1e-9
    # uniform distribution: all Hill numbers equal, evenness 1
    assert got.loc["b", "d1"] == pytest.approx(4.0, abs=1e-6)
    assert got.loc["b", "d2"] == pytest.approx(4.0, abs=1e-6)
    assert got.loc["b", "pielou_j"] == pytest.approx(1.0, abs=1e-6)


def test_tukey_fences_matches_numpy_and_flags_outliers(spark):
    rng = np.random.default_rng(6)
    xs = np.concatenate([rng.normal(50, 5, 500), [200.0, -100.0, 199.0]])
    pdf = pd.DataFrame({"g": "a", "x": xs})
    got = tukey_fences(spark.createDataFrame(pdf), "g", "x", k=1.5).toPandas()
    q1, q3 = np.percentile(xs, [25, 75])  # numpy linear == type 7
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    assert int(got["n_rows"][0]) == 503
    assert got["q1"][0] == pytest.approx(q1, abs=1e-6)
    assert got["q3"][0] == pytest.approx(q3, abs=1e-6)
    assert got["lo_fence"][0] == pytest.approx(lo, abs=1e-6)
    assert got["hi_fence"][0] == pytest.approx(hi, abs=1e-6)
    assert int(got["n_below"][0]) == int((xs < lo).sum()) >= 1
    assert int(got["n_above"][0]) == int((xs > hi).sum()) >= 2
    assert got["pct_out"][0] == pytest.approx(
        ((xs < lo).sum() + (xs > hi).sum()) / 503, abs=1e-6
    )


def test_tukey_fences_nulls_and_multigroup(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 5 + ["b"] * 4,
            "x": [1.0, 2.0, 3.0, 4.0, None, 10.0, 10.0, 10.0, 10.0],
        }
    )
    got = (
        tukey_fences(spark.createDataFrame(pdf), "g", "x")
        .orderBy("g")
        .toPandas()
        .set_index("g")
    )
    assert int(got.loc["a", "n_rows"]) == 4  # NULL excluded
    # constant group: iqr 0, fences collapse to the value, no outliers
    assert got.loc["b", "iqr"] == pytest.approx(0.0, abs=1e-9)
    assert int(got.loc["b", "n_below"]) == 0 and int(got.loc["b", "n_above"]) == 0
