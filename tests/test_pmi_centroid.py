"""PMI collocations (operators/textstats.py) and embedding-centroid
drift (operators/drift.py) vs numpy/hand references."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pytest

from htm_streamer_spark.operators.drift import centroid_drift
from htm_streamer_spark.operators.textstats import pmi_collocations


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------


def _pmi_ref(texts, min_count, top_k):
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = [w for w in re.sub(r"[^a-z0-9 ]", "", t.lower()).split() if w]
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    n1, n2 = sum(uni.values()), sum(bi.values())
    out = []
    for (a, b), c in bi.items():
        if c < min_count:
            continue
        pmi = math.log((c / n2) / ((uni[a] / n1) * (uni[b] / n1)))
        out.append((a, b, c, round(pmi, 6)))
    out.sort(key=lambda r: (-r[3], r[0], r[1]))
    return out[:top_k]


def test_pmi_matches_reference_with_planted_collocation(spark):
    # "los angeles" always co-occurs; "the"+"data" co-occur by chance only
    texts = (
        ["we visited los angeles last summer and loved los angeles a lot"] * 4
        + ["the data the model the data the pipeline the data the run"] * 4
        + ["data quality checks run over the corpus every night"] * 3
    )
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = [
        (r.w1, r.w2, r.c_ab, round(r.pmi, 6))
        for r in pmi_collocations(df, min_count=3, top_k=100).collect()
    ]
    want = _pmi_ref(texts, 3, 100)
    assert got == want
    # the planted phrase must beat the chance pair
    scores = {(a, b): p for a, b, _, p in got}
    assert scores[("los", "angeles")] > scores[("the", "data")]


def test_pmi_min_count_gate(spark):
    texts = ["alpha beta gamma", "alpha beta delta", "rare pair here"]
    df = spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    rows = pmi_collocations(df, min_count=2, top_k=10).collect()
    pairs = {(r.w1, r.w2) for r in rows}
    assert pairs == {("alpha", "beta")}  # the only bigram with count >= 2


# ---------------------------------------------------------------------------
# centroid_drift
# ---------------------------------------------------------------------------


def test_centroid_drift_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs, rows = {}, []
    for g, shift in (("a", 0.0), ("b", 0.5), ("c", 2.0)):
        m = rng.normal(shift, 1.0, size=(40, 8)).astype(np.float32)
        vecs[g] = m
        rows += [(g, [float(x) for x in v]) for v in m]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    got = {r.label: r for r in centroid_drift(df, "label").collect()}

    allm = np.concatenate(list(vecs.values())).astype(np.float64).mean(axis=0)
    for g, m in vecs.items():
        cm = m.astype(np.float64).mean(axis=0)
        cos = float(cm @ allm / math.sqrt((cm @ cm) * (allm @ allm)))
        l2 = float(np.sqrt(((cm - allm) ** 2).sum()))
        assert got[g].n_vecs == 40
        assert got[g].cos_sim == pytest.approx(cos, abs=1e-9)
        assert got[g].l2_dist == pytest.approx(l2, abs=1e-9)
    # drift is distance from the GLOBAL centroid (per-dim ~0.83 here):
    # c (2.0) is farthest, then a (0.0), then b (0.5)
    assert got["c"].l2_dist > got["a"].l2_dist > got["b"].l2_dist


def test_centroid_drift_single_group_is_identity(spark):
    rng = np.random.default_rng(5)
    rows = [
        ("only", [float(x) for x in rng.normal(size=6)]) for _ in range(25)
    ]
    df = spark.createDataFrame(rows, ["label", "embedding"])
    r = centroid_drift(df, "label").collect()[0]
    assert r.cos_sim == pytest.approx(1.0, abs=1e-12)
    assert r.l2_dist == pytest.approx(0.0, abs=1e-12)
