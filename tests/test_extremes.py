"""Extreme-value diagnostics (operators/extremes.py) vs sequential
numpy references: ESD peeling against a literal remove-the-argmax loop
(including the masking scenario Grubbs misses), Hill tail index against
the textbook order-statistic formula on a Pareto sample."""

import math

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.extremes import esd_peel, hill_tail


def _esd_ref(ids, xs, rounds=3, z_crit=3.0):
    """Literal Rosner loop: argmax |x-mean|/sd (sample sd), remove,
    recompute. Ties on round(|dev|, 9) break toward the smallest id."""
    ids = list(ids)
    xs = [float(v) for v in xs]
    out = []
    for rnd in range(1, rounds + 1):
        n = len(xs)
        if n < 3:
            break
        mean = sum(xs) / n
        var = max((sum(v * v for v in xs) - sum(xs) ** 2 / n) / (n - 1), 0.0)
        sd = math.sqrt(var)
        devs = [abs(v - mean) for v in xs]
        best = max(range(n), key=lambda i: (round(devs[i], 9), -ids[i]))
        r = round(devs[best] / sd + 1e-9, 6) if sd > 0 else None
        out.append(
            dict(
                round=rnd,
                n_before=n,
                out_id=ids[best],
                out_value=xs[best],
                r_stat=r,
                exceeds=int(r is not None and r > z_crit),
            )
        )
        del ids[best], xs[best]
    return out


def test_esd_unmasks_second_outlier(spark):
    # Two huge points: plain max-z flags the first; after peeling it,
    # the recomputed (smaller) sd must expose the second.
    rng = np.random.default_rng(7)
    xs = rng.normal(10.0, 1.0, 200)
    xs[3] = 500.0
    xs[17] = 480.0
    pdf = pd.DataFrame({"g": "a", "id": np.arange(200), "x": xs})
    got = (
        esd_peel(spark.createDataFrame(pdf), "g", "id", "x", rounds=3)
        .orderBy("round")
        .toPandas()
    )
    ref = _esd_ref(pdf["id"], pdf["x"], rounds=3)
    assert list(got["out_id"]) == [r["out_id"] for r in ref] == [3, 17, ref[2]["out_id"]]
    assert list(got["n_before"]) == [200, 199, 198]
    for i, r in enumerate(ref):
        assert got["r_stat"][i] == pytest.approx(r["r_stat"], abs=1e-6)
        assert int(got["exceeds"][i]) == r["exceeds"]
    # both injected rows exceed z_crit; the third (clean) pick must not
    assert list(got["exceeds"])[:2] == [1, 1] and int(got["exceeds"][2]) == 0


def test_esd_multi_group_and_small_group_stops(spark):
    rng = np.random.default_rng(11)
    rows = []
    for g, n in [("a", 50), ("b", 2)]:  # b: n<3 → never peeled
        for i, v in enumerate(rng.normal(0, 1, n)):
            rows.append((g, i, float(v)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "id", "x"]))
    got = esd_peel(df, "g", "id", "x", rounds=2).toPandas()
    assert set(got["g"]) == {"a"}
    ref = _esd_ref(range(50), [r[2] for r in rows if r[0] == "a"], rounds=2)
    got_a = got.sort_values("round").reset_index(drop=True)
    assert list(got_a["out_id"]) == [r["out_id"] for r in ref]


def _hill_ref(xs, k):
    xs = np.sort(np.asarray([v for v in xs if v > 0], dtype=float))[::-1]
    if len(xs) < k + 1:
        return len(xs), None, None
    h = float(np.mean(np.log(xs[:k] / xs[k])))
    alpha = 1.0 / h if h > 0 else None
    return len(xs), round(h + 1e-9, 6), (round(alpha + 1e-9, 6) if alpha else None)


def test_hill_recovers_pareto_exponent(spark):
    # Pareto(alpha=2.5): Hill on the top-k should land near 2.5.
    rng = np.random.default_rng(3)
    xs = (1.0 / rng.uniform(size=4000)) ** (1.0 / 2.5)
    pdf = pd.DataFrame({"g": "a", "x": xs})
    got = hill_tail(spark.createDataFrame(pdf), "g", "x", k=200).toPandas()
    n_pos, h, alpha = _hill_ref(xs, 200)
    assert int(got["n_pos"][0]) == n_pos == 4000
    assert got["hill_h"][0] == pytest.approx(h, abs=1e-6)
    assert got["alpha"][0] == pytest.approx(alpha, abs=1e-6)
    assert 2.0 < got["alpha"][0] < 3.0
    assert got["se"][0] == pytest.approx(got["alpha"][0] / math.sqrt(200), abs=1e-6)


def test_hill_filters_nonpositive_and_null_on_thin_group(spark):
    pdf = pd.DataFrame(
        {
            "g": ["a"] * 30 + ["b"] * 5,
            "x": list(np.linspace(1, 30, 30)) + [-1.0, 0.0, 2.0, 3.0, 4.0],
        }
    )
    got = (
        hill_tail(spark.createDataFrame(pdf), "g", "x", k=10)
        .orderBy("g")
        .toPandas()
    )
    # group a: 30 positive rows, enough for k+1=11
    n_pos, h, alpha = _hill_ref(pdf[pdf.g == "a"]["x"], 10)
    assert int(got["n_pos"][0]) == 30
    assert got["alpha"][0] == pytest.approx(alpha, abs=1e-6)
    # group b: only 3 positive rows → NULL alpha, n_pos still counted
    assert int(got["n_pos"][1]) == 3
    assert pd.isna(got["alpha"][1]) and pd.isna(got["hill_h"][1])
