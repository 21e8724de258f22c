"""Property-based veccheck parity: hypothesis generates arbitrary
small vector tables mixing every corruption (null, wrong dim, NaN,
±Inf, zero vectors); embedding_integrity's counters and norm stats
must match a direct numpy reference on every one."""

from __future__ import annotations

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)

from htm_streamer_spark.operators.veccheck import embedding_integrity

DIM = 3

finite = st.floats(-8, 8, width=32).map(lambda x: float(np.float32(x)))
good_vec = st.lists(finite, min_size=DIM, max_size=DIM)
bad_vec = st.one_of(
    st.none(),
    st.lists(finite, min_size=1, max_size=DIM - 1),  # wrong dim
    st.lists(finite, min_size=DIM, max_size=DIM).map(
        lambda v: [float("nan")] + v[1:]
    ),
    st.lists(finite, min_size=DIM, max_size=DIM).map(
        lambda v: v[:-1] + [float("inf")]
    ),
    st.just([0.0] * DIM),
)
row = st.tuples(st.integers(0, 1), st.one_of(good_vec, bad_vec))
tables = st.lists(row, min_size=1, max_size=20)

SCHEMA = StructType(
    [
        StructField("label", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _reference(rows):
    out = {}
    for label, vec in rows:
        g = out.setdefault(
            label,
            dict(n_vec=0, n_null=0, n_wrong_dim=0, n_nonfinite=0, n_zero=0, norms=[]),
        )
        g["n_vec"] += 1
        if vec is None:
            g["n_null"] += 1
            continue
        if len(vec) != DIM:
            g["n_wrong_dim"] += 1
            continue
        if any(math.isnan(x) or math.isinf(x) for x in vec):
            g["n_nonfinite"] += 1
            continue
        n = math.sqrt(sum(float(x) * float(x) for x in vec))
        g["norms"].append(n)
        if n == 0.0:
            g["n_zero"] += 1
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(tables)
def test_integrity_matches_numpy_reference(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        r["label"]: r.asDict()
        for r in embedding_integrity(df, "embedding", dim=DIM, group_by="label").collect()
    }
    ref = _reference(rows)
    assert set(got) == set(ref)
    for label, g in ref.items():
        s = got[label]
        for k in ("n_vec", "n_null", "n_wrong_dim", "n_nonfinite", "n_zero"):
            assert s[k] == g[k], (label, k, s, g)
        assert s["ok"] is (g["n_null"] + g["n_wrong_dim"] + g["n_nonfinite"] == 0)
        if g["norms"]:
            assert s["norm_min"] == pytest.approx(min(g["norms"]), abs=1e-6)
            assert s["norm_max"] == pytest.approx(max(g["norms"]), abs=1e-6)
            assert s["norm_avg"] == pytest.approx(
                sum(g["norms"]) / len(g["norms"]), abs=1e-6
            )
        else:
            assert s["norm_min"] is None and s["norm_max"] is None
