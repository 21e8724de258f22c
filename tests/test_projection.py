"""JL random projection (operators/projection.py): numpy parity,
distance preservation at the JL-prescribed k, seed determinism, and
the zero-shuffle single-scan plan."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import numpy as np
import pandas as pd

from htm_streamer_spark.operators.projection import (
    rademacher_matrix,
    random_projection,
)

D, K = 32, 16


def _vecs(n=200, d=D, seed=5):
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n, d))


def _project(spark, v, k=K, seed=7):
    pdf = pd.DataFrame({"vid": range(len(v)), "vec": [r.tolist() for r in v]})
    out = random_projection(
        spark.createDataFrame(pdf), "vid", "vec", in_dim=v.shape[1], out_dim=k,
        seed=seed,
    ).collect()
    m = np.zeros((len(v), k))
    for r in out:
        m[r["vid"], r["j"]] = r["value"]
    return m


def test_matches_numpy_matmul(spark):
    v = _vecs(50)
    got = _project(spark, v)
    want = v @ rademacher_matrix(K, D, seed=7).T
    assert np.max(np.abs(got - want)) < 1e-9


def test_distance_preservation(spark):
    """Distance-geometry contract at k=16 over 100 gaussian points.
    The worst-PAIR JL bound needs k ≈ 8·ln(n)/ε² (≈150 for ε=0.5
    here), so at a practical k the pinned property is distributional:
    squared-distance ratios concentrate on 1 (E[ratio]=1 exactly for
    a Rademacher/√k matrix) — median within 15%, central 90% of pairs
    within a 2× band."""
    v = _vecs(100)
    p = _project(spark, v)

    def pdist2(m):
        s = (m * m).sum(1)
        return s[:, None] + s[None, :] - 2 * (m @ m.T)

    d0, d1 = pdist2(v), pdist2(p)
    iu = np.triu_indices(len(v), 1)
    ratio = d1[iu] / d0[iu]
    assert abs(np.median(ratio) - 1.0) < 0.15
    lo, hi = np.quantile(ratio, [0.05, 0.95])
    assert lo > 0.45 and hi < 1.9


def test_seed_changes_sketch_deterministically(spark):
    v = _vecs(10)
    a1, a2 = _project(spark, v, seed=7), _project(spark, v, seed=7)
    b = _project(spark, v, seed=8)
    assert np.array_equal(a1, a2)
    assert not np.array_equal(a1, b)


def test_zero_shuffle_single_scan_plan(spark, tmp_path):
    v = _vecs(20)
    pdf = pd.DataFrame({"vid": range(len(v)), "vec": [r.tolist() for r in v]})
    path = str(tmp_path / "proj_src")
    spark.createDataFrame(pdf).write.parquet(path)
    plan_df = random_projection(
        spark.read.parquet(path), "vid", "vec", in_dim=D, out_dim=K
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "Exchange" not in plan  # narrow: projection needs no shuffle
    assert "Python" not in plan  # all JVM codegen, no UDF
