"""Tail dependence, ratio metrics, and feature relevance
(operators/dependence.py) vs literal numpy references."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.dependence import (
    feature_relevance,
    ratio_metric,
    tail_dependence,
)
from pyspark.sql import functions as F


def _tail_ref(x, y, q):
    sx = pd.Series(x).rank(method="max") / len(x)
    sy = pd.Series(y).rank(method="max") / len(y)
    up = sx > q
    lo = sx <= 1 - q
    lu = ((sy > q) & up).sum() / up.sum() if up.sum() else None
    ll = ((sy <= 1 - q) & lo).sum() / lo.sum() if lo.sum() else None
    return int(up.sum()), lu, int(lo.sum()), ll


def test_tail_dependence_comonotone_vs_independent(spark):
    rng = np.random.default_rng(5)
    n = 2000
    x = rng.normal(size=n)
    rows = []
    for g, y in [
        ("co", x + rng.normal(0, 0.05, n)),  # co-extreme
        ("ind", rng.normal(size=n)),  # independent
    ]:
        rows += [(g, float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x", "y"]))
    got = tail_dependence(df, "g", "x", "y", q=0.95).toPandas().set_index("g")
    xs = {"co": x, "ind": x}
    ys = {
        "co": [r[2] for r in rows if r[0] == "co"],
        "ind": [r[2] for r in rows if r[0] == "ind"],
    }
    for g in ("co", "ind"):
        nu, lu, nl, ll = _tail_ref(xs[g], ys[g], 0.95)
        assert int(got.loc[g, "n_upper"]) == nu
        assert got.loc[g, "lambda_u"] == pytest.approx(lu, abs=1e-6)
        assert got.loc[g, "lambda_l"] == pytest.approx(ll, abs=1e-6)
    assert got.loc["co", "lambda_u"] > 0.8  # extremes co-occur
    assert got.loc["ind", "lambda_u"] < 0.25  # ≈ 1-q under independence


def test_tail_dependence_tiny_group_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"g": ["t"] * 3, "x": [1.0, 2.0, 3.0], "y": [1.0, 2.0, 3.0]})
    )
    got = tail_dependence(df, "g", "x", "y", q=0.95).toPandas()
    # n=3: no row has cume_dist > 0.95 except the max (1.0 > 0.95) —
    # upper set nonempty; lower set (u <= 0.05) empty → NULL lambda_l
    assert int(got["n_lower"][0]) == 0 and pd.isna(got["lambda_l"][0])
    assert got["lambda_u"][0] == pytest.approx(1.0, abs=1e-9)


def _ratio_ref(ents):
    n = np.array([e[0] for e in ents], float)
    d = np.array([e[1] for e in ents], float)
    r = n.sum() / d.sum()
    rm = np.mean([a / b for a, b in zip(n, d) if b != 0])
    e = len(ents)
    se = math.sqrt(
        max(
            np.var(n, ddof=1)
            - 2 * r * np.cov(n, d, ddof=1)[0, 1]
            + r * r * np.var(d, ddof=1),
            0.0,
        )
    ) / (d.mean() * math.sqrt(e))
    return r, rm, se


def test_ratio_metric_matches_delta_reference(spark):
    rng = np.random.default_rng(11)
    rows = []
    ents = []
    for u in range(80):
        k = int(rng.integers(1, 30))  # heavy vs light entities
        vals = rng.exponential(2.0, k)
        ents.append((vals.sum(), k))
        rows += [("a", u, float(v), 1.0) for v in vals]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "user", "num", "den"])
    )
    got = ratio_metric(df, "g", "user", "num", F.col("den")).toPandas()
    r, rm, se = _ratio_ref(ents)
    assert int(got["n_entities"][0]) == 80
    assert got["r_sums"][0] == pytest.approx(r, abs=1e-6)
    assert got["r_means"][0] == pytest.approx(rm, abs=1e-6)
    assert got["se_delta"][0] == pytest.approx(se, abs=1e-6)
    # heavy-entity design: the two estimands must visibly diverge —
    # that divergence is the operator's reason to exist
    assert abs(got["r_sums"][0] - got["r_means"][0]) > 1e-6


def test_ratio_metric_zero_den_entity_and_single_entity(spark):
    rows = [("a", 1, 10.0, 5.0), ("a", 2, 3.0, 0.0), ("b", 9, 4.0, 2.0)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "user", "num", "den"])
    )
    got = (
        ratio_metric(df, "g", "user", "num", F.col("den"))
        .toPandas()
        .set_index("g")
    )
    # zero-den entity kept in sums, excluded from r_means
    assert got.loc["a", "r_sums"] == pytest.approx(13.0 / 5.0, abs=1e-9)
    assert got.loc["a", "r_means"] == pytest.approx(2.0, abs=1e-9)
    # single entity → NULL SE
    assert pd.isna(got.loc["b", "se_delta"])


def _mi_ref(xs, ys):
    from collections import Counter

    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx, cy = Counter(xs), Counter(ys)
    mi = sum(
        c / n * math.log((c / n) / ((cx[x] / n) * (cy[y] / n)))
        for (x, y), c in cxy.items()
    )
    hx = -sum(c / n * math.log(c / n) for c in cx.values())
    hy = -sum(c / n * math.log(c / n) for c in cy.values())
    return hx, hy, mi


def test_feature_relevance_ranks_informative_feature_first(spark):
    rng = np.random.default_rng(17)
    y = rng.choice(["p", "q"], 600)
    informative = [v if rng.uniform() < 0.9 else "p" for v in y]
    noise = list(rng.choice(["u", "v", "w"], 600))
    const = ["z"] * 600
    pdf = pd.DataFrame(
        {"label": y, "inf": informative, "noise": noise, "const": const}
    )
    got = (
        feature_relevance(
            spark.createDataFrame(pdf), "label", ["inf", "noise", "const"]
        )
        .toPandas()
        .set_index("feature")
    )
    hx, hy, mi = _mi_ref(pdf["inf"], pdf["label"])
    assert got.loc["inf", "h_feature"] == pytest.approx(hx, abs=1e-6)
    assert got.loc["inf", "h_label"] == pytest.approx(hy, abs=1e-6)
    assert got.loc["inf", "mi"] == pytest.approx(mi, abs=1e-6)
    assert got.loc["inf", "nmi"] == pytest.approx(
        mi / math.sqrt(hx * hy), abs=1e-6
    )
    # ranking: informative ≫ noise; constant feature has no entropy
    assert got.loc["inf", "nmi"] > 5 * max(got.loc["noise", "nmi"], 1e-9)
    assert got.loc["const", "mi"] == pytest.approx(0.0, abs=1e-9)
    assert pd.isna(got.loc["const", "nmi"])
    assert int(got.loc["const", "n_cells"]) == 2


def test_feature_relevance_pairwise_null_deletion(spark):
    pdf = pd.DataFrame(
        {
            "label": ["a", "a", "b", None],
            "f1": ["x", None, "y", "y"],
            "f2": ["u", "u", "v", "v"],
        }
    )
    got = (
        feature_relevance(spark.createDataFrame(pdf), "label", ["f1", "f2"])
        .toPandas()
        .set_index("feature")
    )
    assert int(got.loc["f1", "n_rows"]) == 2  # row 2 (null f1), row 4 (null y)
    assert int(got.loc["f2", "n_rows"]) == 3
