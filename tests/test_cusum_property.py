"""Property-based CUSUM parity: hypothesis generates arbitrary small
series (duplicate order keys, negative values, multiple groups); the
windowed Spark formulation must match a direct numpy reference computed
on the tie-collapsed series, regardless of row order or partitioning."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from htm_streamer_spark.operators.stattests import cusum_changepoint

row = st.fixed_dictionaries(
    {
        "g": st.sampled_from(["a", "b"]),
        "i": st.integers(0, 8),
        # 2-dp decimals: exactly representable enough that Spark's and
        # numpy's double sums stay well inside the 6-dp rounding
        "v": st.integers(-500, 500).map(lambda c: c / 100.0),
    }
)


def reference(rows):
    out = {}
    for g in {r["g"] for r in rows}:
        xs = [r for r in rows if r["g"] == g]
        x = np.array([r["v"] for r in xs], dtype=float)
        n, mean = len(x), x.mean()
        sigma = math.sqrt(max((x * x).mean() - mean * mean, 0.0))
        # collapse order ties: one running-sum evaluation per distinct i
        per_i = {}
        for r in xs:
            s, c = per_i.get(r["i"], (0.0, 0))
            per_i[r["i"]] = (s + r["v"], c + 1)
        run, stats = 0.0, []
        for i in sorted(per_i):
            s, c = per_i[i]
            run += s - c * mean
            if sigma > 0:
                stats.append((round(abs(run) / (sigma * math.sqrt(n)) + 1e-9, 6), i))
            else:
                stats.append((0.0, i))
        m = max(s for s, _ in stats)
        cp = min(i for s, i in stats if s == m)
        out[g] = (n, m, cp)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(row, min_size=1, max_size=24))
def test_cusum_matches_collapsed_reference(spark, rows):
    df = spark.createDataFrame(
        [(r["g"], r["i"], r["v"]) for r in rows],
        "g string, i long, v double",
    ).repartition(3)
    got = {
        r["g"]: (r["n"], r["cusum_stat"], r["cp_i"])
        for r in cusum_changepoint(df, "g", "i", "v").collect()
    }
    want = reference(rows)
    assert set(got) == set(want)
    for g, (n, stat, cp) in want.items():
        gn, gstat, gcp = got[g]
        assert gn == n
        assert abs(gstat - stat) <= 2e-6
        assert gcp == cp
