"""Hellinger/Bhattacharyya source distance and Cramér's V association
(operators/infotheory.py) vs literal numpy references, including the
disjoint-support and perfect-association edge cases."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.infotheory import cramers_v, hellinger_sources


def _dist(texts):
    from collections import Counter

    c = Counter(w for t in texts for w in t.lower().split())
    n = sum(c.values())
    return {k: v / n for k, v in c.items()}


def _hellinger_ref(pa, pb):
    bc = sum(math.sqrt(pa[t] * pb[t]) for t in set(pa) & set(pb))
    return bc, math.sqrt(1 - min(bc, 1.0)), (-math.log(bc) if bc > 0 else None)


def test_hellinger_matches_reference_and_bounds(spark):
    docs = pd.DataFrame(
        {
            "source": ["a"] * 3 + ["b"] * 3,
            "text": [
                "the cat sat on the mat",
                "the dog sat",
                "cat and dog",
                "the dog ran over the hill",
                "a cat ran",
                "dog dog dog",
            ],
        }
    )
    got = (
        hellinger_sources(spark.createDataFrame(docs), "source")
        .orderBy("source_a", "source_b")
        .toPandas()
    )
    pa = _dist(docs[docs.source == "a"]["text"])
    pb = _dist(docs[docs.source == "b"]["text"])
    bc, h, db = _hellinger_ref(pa, pb)
    assert len(got) == 1
    assert int(got["n_shared_terms"][0]) == len(set(pa) & set(pb))
    assert got["bc"][0] == pytest.approx(bc, abs=1e-6)
    assert got["hellinger"][0] == pytest.approx(h, abs=1e-6)
    assert got["bhattacharyya"][0] == pytest.approx(db, abs=1e-6)
    assert 0.0 <= got["bc"][0] <= 1.0 and 0.0 <= got["hellinger"][0] <= 1.0


def test_hellinger_disjoint_support_is_maximal(spark):
    docs = pd.DataFrame(
        {
            "source": ["a", "b"],
            "text": ["alpha beta gamma", "delta epsilon zeta"],
        }
    )
    got = hellinger_sources(spark.createDataFrame(docs), "source").toPandas()
    assert int(got["n_shared_terms"][0]) == 0
    assert got["bc"][0] == pytest.approx(0.0, abs=1e-9)
    assert got["hellinger"][0] == pytest.approx(1.0, abs=1e-9)
    assert pd.isna(got["bhattacharyya"][0])  # -ln 0 undefined → NULL


def _chi2_ref(xs, ys):
    xs, ys = np.asarray(xs), np.asarray(ys)
    xl, yl = sorted(set(xs)), sorted(set(ys))
    obs = np.zeros((len(xl), len(yl)))
    for x, y in zip(xs, ys):
        obs[xl.index(x), yl.index(y)] += 1
    n = obs.sum()
    exp = obs.sum(1, keepdims=True) * obs.sum(0, keepdims=True) / n
    chi2 = ((obs - exp) ** 2 / exp).sum()  # full grid, zero cells included
    r, k = len(xl), len(yl)
    v = math.sqrt(chi2 / (n * (min(r, k) - 1))) if min(r, k) > 1 else None
    phi2c = max(chi2 / n - (r - 1) * (k - 1) / (n - 1), 0.0)
    rc = r - (r - 1) ** 2 / (n - 1)
    kc = k - (k - 1) ** 2 / (n - 1)
    vc = math.sqrt(phi2c / (min(rc, kc) - 1)) if min(rc, kc) > 1 else None
    return chi2, r, k, v, vc


def test_cramers_v_matches_full_grid_reference(spark):
    # includes a zero-observed cell: (c, 1) never occurs
    rng = np.random.default_rng(2)
    xs = list(rng.choice(["a", "b", "c"], 300))
    ys = [int(rng.integers(0, 2)) if x != "c" else 0 for x in xs]
    got = cramers_v(
        spark.createDataFrame(pd.DataFrame({"x": xs, "y": ys})), "x", "y"
    ).toPandas()
    chi2, r, k, v, vc = _chi2_ref(xs, ys)
    assert int(got["n_rows"][0]) == 300
    assert (int(got["n_x"][0]), int(got["n_y"][0])) == (r, k)
    assert int(got["dof"][0]) == (r - 1) * (k - 1)
    assert got["chi2"][0] == pytest.approx(chi2, abs=1e-6)
    assert got["v"][0] == pytest.approx(v, abs=1e-6)
    assert got["v_corrected"][0] == pytest.approx(vc, abs=1e-6)


def test_cramers_v_perfect_and_independent(spark):
    # perfect association: y == x → V == 1
    xs = ["a", "b", "c"] * 40
    got = cramers_v(
        spark.createDataFrame(pd.DataFrame({"x": xs, "y": xs})), "x", "y"
    ).toPandas()
    assert got["v"][0] == pytest.approx(1.0, abs=1e-9)
    # exact independence (balanced product design) → chi2 == 0, V == 0
    prod = [(x, y) for x in "ab" for y in [0, 1] for _ in range(25)]
    got2 = cramers_v(
        spark.createDataFrame(pd.DataFrame(prod, columns=["x", "y"])), "x", "y"
    ).toPandas()
    assert got2["chi2"][0] == pytest.approx(0.0, abs=1e-9)
    assert got2["v"][0] == pytest.approx(0.0, abs=1e-9)
    # nulls excluded
    got3 = cramers_v(
        spark.createDataFrame(
            pd.DataFrame({"x": ["a", "a", None, "b"], "y": [1, None, 1, 2]})
        ),
        "x",
        "y",
    ).toPandas()
    assert int(got3["n_rows"][0]) == 2
