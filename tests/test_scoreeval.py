"""Score/label evaluation (operators/scoreeval.py) vs a numpy midrank
reference, plus the ROC identities that pin the semantics: label-flip
antisymmetry, perfect-separator extremes, and tie handling."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.scoreeval import score_label_eval


def _auc_ref(scores, labels):
    """Midrank (Mann-Whitney) AUC in pure numpy."""
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    order = np.argsort(scores, kind="mergesort")
    s = scores[order]
    ranks = np.empty(len(s))
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # midrank, 1-based
        i = j
    r = np.empty(len(s))
    r[order] = ranks
    n_pos = labels.sum()
    n_neg = len(labels) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    return (r[labels == 1].sum() - n_pos * (n_pos + 1) / 2.0) / (
        n_pos * n_neg
    )


def _youden_ref(scores, labels):
    scores = np.asarray(scores, dtype=float)
    labels = np.asarray(labels, dtype=int)
    n_pos, n_neg = labels.sum(), (1 - labels).sum()
    best = None
    for t in sorted(set(scores), reverse=True):
        tpr = (scores[labels == 1] >= t).sum() / n_pos
        fpr = (scores[labels == 0] >= t).sum() / n_neg
        j = tpr - fpr
        key = (-j, fpr, -t)
        if best is None or key < best[0]:
            best = (key, t, tpr, fpr, j)
    return best[1:]


def _mk(spark, scores, labels, group="a"):
    pdf = pd.DataFrame(
        {"g": group, "s": np.asarray(scores, float), "lab": labels}
    )
    return spark.createDataFrame(pdf)


def test_matches_numpy_with_ties(spark):
    rng = np.random.default_rng(3)
    scores = np.round(rng.normal(0, 1, 400), 1)  # heavy ties
    labels = (scores + rng.normal(0, 1, 400) > 0).astype(int)
    df = _mk(spark, scores, labels).repartition(7)
    r = score_label_eval(df, "g", "s", "lab").collect()[0]
    assert r["auc"] == pytest.approx(_auc_ref(scores, labels), abs=2e-6)
    t, tpr, fpr, j = _youden_ref(scores, labels)
    assert r["best_thr"] == pytest.approx(t, abs=2e-6)
    assert r["tpr_best"] == pytest.approx(tpr, abs=2e-6)
    assert r["fpr_best"] == pytest.approx(fpr, abs=2e-6)
    assert r["youden_j"] == pytest.approx(j, abs=2e-6)
    assert r["n_pos"] == int(labels.sum())
    assert r["n_neg"] == int((1 - labels).sum())


def test_label_flip_antisymmetry(spark):
    rng = np.random.default_rng(7)
    scores = rng.normal(0, 1, 300)
    labels = (rng.random(300) < 0.4).astype(int)
    a = score_label_eval(_mk(spark, scores, labels), "g", "s", "lab").collect()[0]
    b = score_label_eval(_mk(spark, scores, 1 - labels), "g", "s", "lab").collect()[0]
    assert a["auc"] + b["auc"] == pytest.approx(1.0, abs=2e-6)


def test_perfect_and_random_separators(spark):
    scores = np.concatenate([np.arange(100, 200), np.arange(0, 100)])
    labels = np.array([1] * 100 + [0] * 100)
    r = score_label_eval(_mk(spark, scores, labels), "g", "s", "lab").collect()[0]
    assert r["auc"] == 1.0 and r["youden_j"] == 1.0
    assert r["best_thr"] == 100.0 and r["tpr_best"] == 1.0 and r["fpr_best"] == 0.0
    # constant score: AUC is exactly 1/2 by the tie convention
    r2 = score_label_eval(
        _mk(spark, np.zeros(50), np.array([1] * 20 + [0] * 30)), "g", "s", "lab"
    ).collect()[0]
    assert r2["auc"] == 0.5


def test_degenerate_group_null_metrics(spark):
    r = score_label_eval(
        _mk(spark, [1.0, 2.0, 3.0], [1, 1, 1]), "g", "s", "lab"
    ).collect()[0]
    assert r["n_pos"] == 3 and r["n_neg"] == 0
    assert r["auc"] is None and r["auc_se"] is None


def test_null_rows_excluded_and_multi_group(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 4 + ["b"] * 4,
            "s": [1.0, 2.0, None, 4.0, 1.0, 2.0, 3.0, 4.0],
            "lab": [0, 1, 1, None, 0, 0, 1, 1],
        }
    )
    out = {
        r["g"]: r
        for r in score_label_eval(
            spark.createDataFrame(pdf), "g", "s", "lab"
        ).collect()
    }
    assert out["a"]["n_pos"] == 1 and out["a"]["n_neg"] == 1
    assert out["b"]["auc"] == 1.0
