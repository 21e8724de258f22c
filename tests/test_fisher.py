"""Fisher's method (operators/stattests.py fisher_combine): reference
parity vs a pure-python even-df chi-square survival, the k=1 identity,
pooling of individually-weak evidence, clamping, empty input."""

from __future__ import annotations

import math
import random

import pytest

from htm_streamer_spark.operators.stattests import fisher_combine


def _chi2_sf_even(x: float, k: int) -> float:
    """Survival P(X > x) for chi-square with df=2k (exact closed form)."""
    if x <= 0:
        return 1.0
    term, total = 1.0, 1.0
    for j in range(1, k):
        term *= (x / 2.0) / j
        total += term
    return min(math.exp(-x / 2.0) * total, 1.0)


def _fisher_ref(ps: list[float]) -> tuple[float, float]:
    x2 = -2.0 * sum(math.log(min(max(p, 1e-300), 1.0)) for p in ps)
    return x2, _chi2_sf_even(x2, len(ps))


def _run(spark, rows):
    df = spark.createDataFrame(rows, "g string, p_value double")
    return {r["g"]: r for r in fisher_combine(df, "g").collect()}


def test_reference_parity_random(spark):
    rng = random.Random(11)
    groups = {f"g{i}": [rng.random() for _ in range(rng.randint(1, 12))] for i in range(8)}
    rows = [(g, p) for g, ps in groups.items() for p in ps]
    got = _run(spark, rows)
    for g, ps in groups.items():
        x2, pc = _fisher_ref(ps)
        assert got[g]["k"] == len(ps)
        assert got[g]["fisher_x2"] == pytest.approx(x2, rel=1e-12)
        assert got[g]["p_combined"] == pytest.approx(pc, rel=1e-10)


def test_k1_identity(spark):
    # df=2 survival = exp(ln p) = p: a single test passes through exactly
    got = _run(spark, [("a", 0.0371)])
    assert got["a"]["p_combined"] == pytest.approx(0.0371, rel=1e-12)


def test_pools_weak_evidence(spark):
    # seven p=0.15 tests: none rejects alone at 0.05, jointly they do
    got = _run(spark, [("w", 0.15)] * 7)
    x2, pc = _fisher_ref([0.15] * 7)
    assert got["w"]["p_combined"] == pytest.approx(pc, rel=1e-10)
    assert got["w"]["p_combined"] < 0.05  # ≈0.022: joint rejection at the
    # conventional gate no individual p=0.15 test passes


def test_all_ones_and_zero_clamp(spark):
    got = _run(spark, [("ones", 1.0), ("ones", 1.0), ("zero", 0.0), ("zero", 0.5)])
    assert got["ones"]["fisher_x2"] == 0.0 and got["ones"]["p_combined"] == 1.0
    # p=0 clamps to the floor: finite x2, p_combined pinned to ~0
    assert math.isfinite(got["zero"]["fisher_x2"])
    assert got["zero"]["p_combined"] == pytest.approx(0.0, abs=1e-250)


def test_large_k_stability(spark):
    # k=200 would overflow factorial(199); the running-term recurrence
    # must stay finite and match the reference
    rng = random.Random(3)
    ps = [rng.uniform(0.3, 0.9) for _ in range(200)]
    got = _run(spark, [("big", p) for p in ps])
    x2, pc = _fisher_ref(ps)
    assert got["big"]["p_combined"] == pytest.approx(pc, rel=1e-9)


def test_empty_input(spark):
    df = spark.createDataFrame([], "g string, p_value double")
    assert fisher_combine(df, "g").count() == 0
