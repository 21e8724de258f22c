"""Embedding-column integrity validation (operators/veccheck.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from htm_streamer_spark.operators.veccheck import embedding_integrity

SCHEMA = StructType(
    [
        StructField("label", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        # label 0: all well-formed 4-dim vectors
        (0, [1.0, 0.0, 0.0, 0.0]),
        (0, [0.0, 2.0, 0.0, 0.0]),
        (0, [0.0, 0.0, 2.0, 1.0]),
        # label 1: every failure mode
        (1, None),                                  # null
        (1, [1.0, 1.0]),                            # wrong dim
        (1, [float("nan"), 0.0, 0.0, 0.0]),         # NaN
        (1, [float("inf"), 0.0, 0.0, 0.0]),         # +Inf
        (1, [-float("inf"), 0.0, 0.0, 0.0]),        # -Inf
        (1, [0.0, 0.0, 0.0, 0.0]),                  # zero vector (soft)
        (1, [3.0, 4.0, 0.0, 0.0]),                  # fine, norm 5
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _by_label(df):
    return {r["label"]: r.asDict() for r in df.collect()}


def test_counts_and_norms(vectors):
    out = _by_label(embedding_integrity(vectors, "embedding", dim=4, group_by="label"))

    l0 = out[0]
    assert (l0["n_vec"], l0["n_null"], l0["n_wrong_dim"], l0["n_nonfinite"]) == (3, 0, 0, 0)
    assert l0["n_zero"] == 0 and l0["ok"] is True
    assert l0["norm_min"] == 1.0 and l0["norm_max"] == pytest.approx(math.sqrt(5))

    l1 = out[1]
    assert (l1["n_vec"], l1["n_null"], l1["n_wrong_dim"], l1["n_nonfinite"]) == (7, 1, 1, 3)
    assert l1["n_zero"] == 1 and l1["ok"] is False
    # norm stats only over the two well-formed vectors (zero + norm-5)
    assert l1["norm_min"] == 0.0 and l1["norm_max"] == 5.0
    assert l1["norm_avg"] == pytest.approx(2.5)


def test_clean_table_is_ok(vectors):
    clean = vectors.filter("label = 0")
    out = _by_label(embedding_integrity(clean, "embedding", dim=4, group_by="label"))
    assert out[0]["ok"] is True


def test_no_python_no_explode_in_plan(vectors):
    """The per-row checks must stay codegen array folds: no Python
    stages, no explode of the vector (explode would shuffle dim rows
    per vector)."""
    df = embedding_integrity(vectors, "embedding", dim=4, group_by="label")
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    assert "Generate" not in phys  # no explode


def test_dim_profile_matches_numpy(vectors):
    import numpy as np

    from htm_streamer_spark.operators.veccheck import embedding_dim_profile

    out = embedding_dim_profile(vectors, "embedding", dim=4, group_by="label")
    rows = {(r["label"], r["j"]): (r["mean"], r["std"]) for r in out.collect()}
    assert len(rows) == 8  # 2 labels x 4 dims

    well_formed = {
        0: np.array([[1, 0, 0, 0], [0, 2, 0, 0], [0, 0, 2, 1]], dtype=float),
        1: np.array([[0, 0, 0, 0], [3, 4, 0, 0]], dtype=float),
    }
    for label, mat in well_formed.items():
        for j in range(4):
            m, s = rows[(label, j)]
            assert m == pytest.approx(mat[:, j].mean(), abs=1e-6)
            assert s == pytest.approx(mat[:, j].std(), abs=1e-6)


def test_dim_profile_explodes_after_aggregation(vectors):
    """The Generate (explode) must sit ABOVE the exchange: it runs on
    the group-sized aggregated frame, never on the fact table (which
    would shuffle dim rows per vector)."""
    from htm_streamer_spark.operators.veccheck import embedding_dim_profile

    df = embedding_dim_profile(vectors, "embedding", dim=4, group_by="label")
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys
    gen, exch = phys.index("Generate"), phys.index("Exchange")
    assert gen < exch, "explode ran below the shuffle (fact-table blowup)"
