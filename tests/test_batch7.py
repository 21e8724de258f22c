"""NB overdispersion (parametric.nb_overdispersion), Kish ESS
(mixing.ess_weights), and top-k vocabulary overlap
(lm.topk_overlap_sources) vs literal references."""

from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.lm import topk_overlap_sources
from htm_streamer_spark.operators.mixing import ess_weights
from htm_streamer_spark.operators.parametric import nb_overdispersion
from pyspark.sql import functions as F


def _nb_ref(counts):
    c = np.asarray(counts, float)
    m, v = c.mean(), c.var(ddof=1)
    if v <= m:
        return m, v, None, None, None
    r = m * m / (v - m)
    return m, v, r, m / v, (r / (r + m)) ** r


def test_nb_overdispersion_recovers_parameters(spark):
    rng = np.random.default_rng(23)
    rows = []
    # NB draws: r=2, p=0.25 → mean 6, var 24 (overdispersed)
    nb_counts = rng.negative_binomial(2, 0.25, 500) + 1  # observed entities
    for e, c in enumerate(nb_counts):
        rows += [("nb", e)] * int(c)
    # Poisson-ish: near-equal counts → underdispersed vs mean → NULL fit
    for e in range(50):
        rows += [("flat", e)] * 5
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "e"]))
    got = nb_overdispersion(df, "g", "e").toPandas().set_index("g")
    m, v, r, p, pz = _nb_ref(nb_counts)
    assert int(got.loc["nb", "n_entities"]) == 500
    assert got.loc["nb", "mean_cnt"] == pytest.approx(m, abs=1e-6)
    assert got.loc["nb", "var_cnt"] == pytest.approx(v, abs=1e-5)
    assert got.loc["nb", "r"] == pytest.approx(r, abs=1e-5)
    assert got.loc["nb", "p"] == pytest.approx(p, abs=1e-6)
    assert got.loc["nb", "pred_zero"] == pytest.approx(pz, abs=1e-6)
    # constant counts: var 0 <= mean → NULL NB fit, fano ~0
    assert pd.isna(got.loc["flat", "r"]) and pd.isna(got.loc["flat", "p"])
    assert got.loc["flat", "fano"] == pytest.approx(0.0, abs=1e-9)


def test_ess_weights_kish(spark):
    w_even = [1.0] * 100
    w_skew = [1.0] * 99 + [1000.0]
    rows = (
        [("even", w) for w in w_even]
        + [("skew", w) for w in w_skew]
        + [("mixed", 0.0), ("mixed", 2.0), ("mixed", None), ("mixed", -5.0)]
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "w"]))
    got = ess_weights(df, "g", F.col("w")).toPandas().set_index("g")

    def kish(ws):
        ws = np.asarray(ws, float)
        return ws.sum() ** 2 / (ws * ws).sum()

    assert got.loc["even", "ess"] == pytest.approx(100.0, abs=1e-6)
    assert got.loc["even", "ess_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert got.loc["skew", "ess"] == pytest.approx(kish(w_skew), abs=1e-4)
    assert got.loc["skew", "ess_ratio"] < 0.02  # one row owns the sample
    # NULL and negative excluded; zero-weight row counts in n, not mass
    assert int(got.loc["mixed", "n_rows"]) == 2
    assert got.loc["mixed", "ess"] == pytest.approx(1.0, abs=1e-9)


def _topk_ref(texts_by_g, k):
    tops = {}
    for g, texts in texts_by_g.items():
        c = Counter(w for t in texts for w in t.lower().split())
        ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        tops[g] = {t for t, _ in ordered}
    return tops


def test_topk_overlap_matches_reference(spark):
    texts = {
        "a": ["the cat sat on the mat", "the dog and the cat"],
        "b": ["the dog ran to the mat", "a dog and a bone"],
        "c": ["alpha beta gamma delta"],
    }
    rows = [(g, t) for g, ts in texts.items() for t in ts]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["source", "text"]))
    got = (
        topk_overlap_sources(df, "source", k=5)
        .orderBy("source_a", "source_b")
        .toPandas()
        .set_index(["source_a", "source_b"])
    )
    tops = _topk_ref(texts, 5)
    for a, b in [("a", "b"), ("a", "c"), ("b", "c")]:
        inter = len(tops[a] & tops[b])
        ka, kb = len(tops[a]), len(tops[b])
        assert int(got.loc[(a, b), "n_common"]) == inter
        assert (int(got.loc[(a, b), "k_a"]), int(got.loc[(a, b), "k_b"])) == (ka, kb)
        assert got.loc[(a, b), "jaccard"] == pytest.approx(
            inter / (ka + kb - inter), abs=1e-6
        )
    # c shares nothing with a/b → 0; c has only 4 distinct terms < k
    assert int(got.loc[("a", "c"), "n_common"]) == 0
    assert int(got.loc[("a", "c"), "k_b"]) == 4
