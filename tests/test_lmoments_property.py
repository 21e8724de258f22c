"""Property-based L-moment parity: hypothesis generates arbitrary
small per-group samples (ties, negatives, constant runs); the windowed
Spark PWM formulation must match the direct numpy order-statistics
reference regardless of row order, and the ratio bounds must hold."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.operators.parametric import l_moments

row = st.fixed_dictionaries(
    {
        "g": st.sampled_from(["a", "b"]),
        # 2-dp decimals keep Spark/numpy double sums inside 6-dp rounding
        "x": st.integers(-500, 500).map(lambda c: c / 100.0),
    }
)


def _ref(xs):
    x = np.sort(np.asarray(xs, float))
    n = len(x)
    i = np.arange(1, n + 1)
    b0 = x.mean()
    out = {"n": n, "l1": round(b0 + 1e-9, 6)}
    if n < 4:
        return out
    b1 = (x * (i - 1) / (n - 1)).mean()
    b2 = (x * (i - 1) * (i - 2) / ((n - 1) * (n - 2))).mean()
    b3 = (x * (i - 1) * (i - 2) * (i - 3) / ((n - 1) * (n - 2) * (n - 3))).mean()
    l2 = 2 * b1 - b0
    l3 = 6 * b2 - 6 * b1 + b0
    l4 = 20 * b3 - 30 * b2 + 12 * b1 - b0
    out["l2"] = round(l2 + 1e-9, 6)
    out["l_skew"] = round(l3 / l2 + 1e-9, 6) if l2 != 0 else None
    out["l_kurt"] = round(l4 / l2 + 1e-9, 6) if l2 != 0 else None
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=40))
def test_l_moments_property_parity(spark, rows):
    pdf = pd.DataFrame(rows)
    got = l_moments(spark.createDataFrame(pdf), "g", "x").toPandas().set_index("g")
    for g in set(pdf["g"]):
        xs = pdf[pdf.g == g]["x"].tolist()
        ref = _ref(xs)
        assert int(got.loc[g, "n_rows"]) == ref["n"]
        assert abs(got.loc[g, "l1"] - ref["l1"]) < 2e-6
        if ref["n"] < 4:
            assert pd.isna(got.loc[g, "l2"])
            continue
        assert abs(got.loc[g, "l2"] - ref["l2"]) < 2e-6
        if ref["l_skew"] is None:
            assert pd.isna(got.loc[g, "l_skew"])
        else:
            assert abs(got.loc[g, "l_skew"] - ref["l_skew"]) < 2e-6
            # Hosking bounds: |t3| <= 1, l2 >= 0
            assert got.loc[g, "l2"] >= -1e-9
            assert abs(got.loc[g, "l_skew"]) <= 1.0 + 1e-6
