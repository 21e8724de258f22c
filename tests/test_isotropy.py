"""Embedding isotropy / collapse detection
(operators/veccheck.py embedding_isotropy) vs a numpy reference."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.veccheck import embedding_isotropy

DIM = 16


def _ref(vecs, dim=DIM):
    x = np.asarray(vecs, dtype=float)
    nrm = np.sqrt((x * x).sum(axis=1))
    x = x[nrm > 0]
    nrm = nrm[nrm > 0]
    n = len(x)
    mean_norm = nrm.sum() / n
    mean_vec = x.sum(axis=0) / n
    centroid_ratio = np.sqrt((mean_vec**2).sum()) / mean_norm
    units = x / nrm[:, None]
    resultant = np.sqrt(((units.sum(axis=0) / n) ** 2).sum())
    var = (x * x).sum(axis=0) / n - mean_vec**2
    vs, vq = var.sum(), (var * var).sum()
    eff = vs * vs / vq / dim if vq > 0 else None
    return {
        "n_valid": n,
        "mean_norm": mean_norm,
        "centroid_ratio": centroid_ratio,
        "resultant": resultant,
        "eff_dim_frac": eff,
    }


def _df(spark, groups):
    rows = []
    for g, vecs in groups.items():
        for v in vecs:
            rows.append({"label": g, "embedding": [float(t) for t in v]})
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(5)


def test_isotropy_matches_numpy_and_separates_regimes(spark):
    rng = np.random.default_rng(17)
    iso = rng.normal(size=(400, DIM))  # isotropic cloud
    cone = np.tile(rng.normal(size=DIM), (400, 1)) + 0.05 * rng.normal(
        size=(400, DIM)
    )  # directional collapse
    base = np.zeros(DIM)
    base[0] = 1.0  # axis-aligned: all variance on one coordinate
    rank1 = np.outer(rng.normal(size=400), base)
    groups = {"iso": iso, "cone": cone, "rank1": rank1}
    out = {
        r["label"]: r
        for r in embedding_isotropy(
            _df(spark, groups), "embedding", DIM, "label"
        ).collect()
    }
    for g, vecs in groups.items():
        ref = _ref(vecs)
        assert out[g]["n_valid"] == ref["n_valid"]
        for c in ("mean_norm", "centroid_ratio", "resultant", "eff_dim_frac"):
            assert out[g][c] == pytest.approx(ref[c], abs=2e-6), (g, c)
    # regime separation: the three ratios disagree exactly as designed
    assert out["iso"]["resultant"] < 0.15 < 0.95 < out["cone"]["resultant"]
    assert out["cone"]["centroid_ratio"] > 0.95
    assert out["iso"]["eff_dim_frac"] > 0.9
    # axis-aligned rank-1 with +/- rays: directions cancel (low
    # resultant, low centroid) but all marginal variance sits on one
    # coordinate — only the participation ratio catches it
    assert out["rank1"]["resultant"] < 0.2
    assert out["rank1"]["eff_dim_frac"] == pytest.approx(1 / DIM, abs=1e-6)


def test_isotropy_validity_gate_and_degenerates(spark):
    rng = np.random.default_rng(3)
    good = [list(rng.normal(size=DIM)) for _ in range(20)]
    rows = [{"label": "g", "embedding": v} for v in good]
    rows.append({"label": "g", "embedding": None})  # null
    rows.append({"label": "g", "embedding": [1.0] * (DIM - 1)})  # wrong dim
    rows.append(
        {"label": "g", "embedding": [float("nan")] + [1.0] * (DIM - 1)}
    )
    rows.append({"label": "g", "embedding": [0.0] * DIM})  # zero norm
    out = embedding_isotropy(
        spark.createDataFrame(pd.DataFrame(rows)), "embedding", DIM, "label"
    ).collect()
    assert len(out) == 1 and out[0]["n_valid"] == 20  # 4 rows gated out
    ref = _ref(good)
    assert out[0]["resultant"] == pytest.approx(ref["resultant"], abs=2e-6)
    # identical vectors: zero variance everywhere -> NULL eff_dim_frac
    same = [[1.0] + [0.0] * (DIM - 1)] * 10
    r = embedding_isotropy(
        _df(spark, {"s": same}), "embedding", DIM, "label"
    ).collect()[0]
    assert r["centroid_ratio"] == pytest.approx(1.0)
    assert r["resultant"] == pytest.approx(1.0)
    assert r["eff_dim_frac"] is None
    # all invalid -> group vanishes (typed schema: a bare-None pandas
    # column infers VOID, which the operator rightly rejects)
    empty = embedding_isotropy(
        spark.createDataFrame(
            [("z", None)], "label string, embedding array<double>"
        ),
        "embedding",
        DIM,
        "label",
    )
    assert empty.count() == 0
