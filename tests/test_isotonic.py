"""Isotonic regression via the distributed minimax identity
(operators/isotonic.py isotonic_fit) vs a sequential weighted-PAVA
reference — the two must agree EXACTLY (RWD 1988 eq. 1.9)."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.isotonic import isotonic_fit


def _pava_ref(xs, ys):
    """Sequential pool-adjacent-violators on the bucket means of the
    raw (x, y) rows, weighted by bucket counts."""
    df = pd.DataFrame({"x": xs, "y": ys}).dropna()
    grp = df.groupby("x")["y"].agg(["sum", "count"]).sort_index()
    blocks = [
        [s / c, c] for s, c in zip(grp["sum"], grp["count"])
    ]  # [mean, weight]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] > blocks[i + 1][0] + 1e-15:
            m1, w1 = blocks[i]
            m2, w2 = blocks[i + 1]
            blocks[i] = [(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out, bi, used = {}, 0, 0
    for x, c in zip(grp.index, grp["count"]):
        out[x] = blocks[bi][0]
        used += c
        if used >= blocks[bi][1]:
            bi, used = bi + 1, 0
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["g", "x", "y"])
    ).repartition(7)


def test_isotonic_matches_sequential_pava(spark):
    rng = np.random.default_rng(19)
    rows = []
    # group "up": noisy increasing; group "vee": decreasing then up
    for g, f in [
        ("up", lambda x: 2 * x + rng.normal(0, 5)),
        ("vee", lambda x: abs(x - 10) * 3 + rng.normal(0, 2)),
        ("flatish", lambda x: rng.normal(0, 1)),
    ]:
        for x in range(20):
            for _ in range(int(rng.integers(1, 6))):
                rows.append((g, x, float(f(x))))
    got = {
        (r["g"], r["x"]): (r["n"], r["mean_y"], r["iso_y"])
        for r in isotonic_fit(_df(spark, rows), "g", "x", "y").collect()
    }
    for g in ("up", "vee", "flatish"):
        xs = [r[1] for r in rows if r[0] == g]
        ys = [r[2] for r in rows if r[0] == g]
        ref = _pava_ref(xs, ys)
        seq = sorted(x for (gg, x) in got if gg == g)
        assert seq == sorted(ref)
        for x in ref:
            assert got[(g, x)][2] == pytest.approx(ref[x], abs=2e-6), (g, x)
        # monotone in x
        vals = [got[(g, x)][2] for x in seq]
        assert all(a <= b + 1e-9 for a, b in zip(vals, vals[1:]))
        # weighted mean preserved by the fit
        w = np.array([got[(g, x)][0] for x in seq], dtype=float)
        iso = np.array(vals)
        raw = np.array([got[(g, x)][1] for x in seq])
        # both columns are 6-dp rounded, so the preserved weighted
        # mean can drift by up to ~0.5e-6 per unit weight
        assert float((w * iso).sum()) == pytest.approx(
            float((w * raw).sum()), abs=1e-6 * float(w.sum())
        )


def test_isotonic_already_monotone_is_identity(spark):
    rows = [("a", x, float(x * x)) for x in range(10) for _ in range(3)]
    out = isotonic_fit(_df(spark, rows), "g", "x", "y").collect()
    for r in out:
        assert r["iso_y"] == pytest.approx(r["mean_y"], abs=1e-6)


def test_isotonic_pools_violator_hand_case(spark):
    # means by x: (1.0, 3.0, 2.0) with weights (1, 1, 1):
    # PAVA pools x=1,2 -> (1.0, 2.5, 2.5)
    rows = [("a", 0, 1.0), ("a", 1, 3.0), ("a", 2, 2.0)]
    got = {
        r["x"]: r["iso_y"]
        for r in isotonic_fit(_df(spark, rows), "g", "x", "y").collect()
    }
    assert got[0] == pytest.approx(1.0, abs=1e-6)
    assert got[1] == pytest.approx(2.5, abs=1e-6)
    assert got[2] == pytest.approx(2.5, abs=1e-6)
    # weighted pooling: same shape but x=1 has weight 3 ->
    # pool(3*3.0, 1*2.0) = 2.75
    rows2 = [("a", 0, 1.0)] + [("a", 1, 3.0)] * 3 + [("a", 2, 2.0)]
    got2 = {
        r["x"]: r["iso_y"]
        for r in isotonic_fit(_df(spark, rows2), "g", "x", "y").collect()
    }
    assert got2[1] == pytest.approx(2.75, abs=1e-6)
    assert got2[2] == pytest.approx(2.75, abs=1e-6)


def test_isotonic_null_y_dropped_and_empty(spark):
    rows = [("a", 0, 1.0), ("a", 0, None), ("a", 1, 2.0)]
    out = isotonic_fit(_df(spark, rows), "g", "x", "y").collect()
    byx = {r["x"]: r for r in out}
    assert byx[0]["n"] == 1 and byx[0]["mean_y"] == pytest.approx(1.0)
    empty = isotonic_fit(
        _df(spark, rows).where("g = 'nope'"), "g", "x", "y"
    )
    assert empty.count() == 0
