"""KMV bottom-k sketches (operators/kmv.py) and Neyman allocation
(operators/sampling.py neyman_allocation)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.kmv import (
    kmv_members,
    kmv_pairwise_jaccard,
    kmv_sketch,
)
from htm_streamer_spark.operators.sampling import neyman_allocation

# ------------------------------------------------------------------- KMV


def _items(spark, groups: dict[str, list[str]]):
    rows = [(g, it) for g, items in groups.items() for it in items]
    return spark.createDataFrame(rows, "g string, item string")


def test_kmv_exact_below_k(spark):
    df = _items(spark, {"small": [f"item-{i}" for i in range(100)]})
    row = kmv_sketch(df, "g", "item", k=256).collect()[0]
    assert row["n_kept"] == 100 and row["est_distinct"] == 100.0


def test_kmv_estimate_accuracy(spark):
    n = 50_000
    df = _items(spark, {"big": [f"item-{i}" for i in range(n)]})
    row = kmv_sketch(df, "g", "item", k=256).collect()[0]
    # rsd ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert row["est_distinct"] == pytest.approx(n, rel=0.25)
    # duplicates must not move the estimate (distinct semantics)
    df2 = _items(spark, {"big": [f"item-{i % n}" for i in range(3 * n)]})
    row2 = kmv_sketch(df2, "g", "item", k=256).collect()[0]
    assert row2["est_distinct"] == row["est_distinct"]


def test_kmv_jaccard_estimate(spark):
    # |A| = |B| = 6000 with 3000 shared: J = 3000/9000 = 1/3
    shared = [f"s-{i}" for i in range(3000)]
    a = shared + [f"a-{i}" for i in range(3000)]
    b = shared + [f"b-{i}" for i in range(3000)]
    m = kmv_members(_items(spark, {"A": a, "B": b}), "g", "item", k=256)
    row = kmv_pairwise_jaccard(m, "g", k=256).collect()[0]
    assert (row["g_a"], row["g_b"]) == ("A", "B")
    assert row["n_union_k"] == 256
    assert row["est_jaccard"] == pytest.approx(1 / 3, abs=0.12)
    # disjoint pair estimates 0 exactly
    m2 = kmv_members(
        _items(spark, {"A": [f"a-{i}" for i in range(5000)],
                       "B": [f"b-{i}" for i in range(5000)]}),
        "g", "item", k=256,
    )
    row2 = kmv_pairwise_jaccard(m2, "g", k=256).collect()[0]
    assert row2["n_both"] == 0 and row2["est_jaccard"] == 0.0


def test_kmv_exact_when_union_small(spark):
    # both sketches exact -> the pairwise numbers are exact set algebra
    a = [f"x-{i}" for i in range(60)]
    b = [f"x-{i}" for i in range(30, 120)]
    m = kmv_members(_items(spark, {"A": a, "B": b}), "g", "item", k=256)
    row = kmv_pairwise_jaccard(m, "g", k=256).collect()[0]
    assert row["n_union_k"] == 120 and row["n_both"] == 30
    assert row["est_jaccard"] == pytest.approx(30 / 120)


def test_kmv_partitioning_invariance(spark):
    df = _items(spark, {"g1": [f"i-{i}" for i in range(4000)],
                        "g2": [f"i-{i}" for i in range(2000, 9000)]})
    one = kmv_sketch(df.coalesce(1), "g", "item", k=128).collect()
    many = kmv_sketch(df.repartition(16), "g", "item", k=128).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, many))


def test_kmv_empty(spark):
    df = spark.createDataFrame([], "g string, item string")
    assert kmv_sketch(df, "g", "item").count() == 0
    assert kmv_pairwise_jaccard(
        kmv_members(df, "g", "item"), "g"
    ).count() == 0


# ---------------------------------------------------------------- Neyman


def test_neyman_textbook_allocation(spark):
    # two strata, same size, sd ratio 1:3 -> budget splits 1:3
    rng = random.Random(7)
    rows = [("lo", rng.gauss(0, 1)) for _ in range(2000)]
    rows += [("hi", rng.gauss(0, 3)) for _ in range(2000)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in neyman_allocation(df, "g", "v", 400).collect()}
    assert out["lo"]["n_alloc"] + out["hi"]["n_alloc"] == 400
    assert out["hi"]["n_alloc"] == pytest.approx(300, abs=15)
    assert out["hi"]["alloc_share"] == pytest.approx(0.75, abs=0.03)


def test_neyman_constant_stratum_gets_nothing(spark):
    rows = [("noisy", float(v)) for v in range(100)]
    rows += [("flat", 5.0)] * 1000  # huge but zero-variance
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r for r in neyman_allocation(df, "g", "v", 50).collect()}
    assert out["flat"]["n_alloc"] == 0 and out["noisy"]["n_alloc"] == 50
    assert out["flat"]["sd"] == 0.0


def test_neyman_sums_to_budget_exactly(spark):
    rng = random.Random(3)
    rows = [(f"s{i % 7}", rng.uniform(0, i % 13 + 1)) for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, v double")
    for budget in (1, 97, 1000):
        total = (
            neyman_allocation(df, "g", "v", budget)
            .agg(F.sum("n_alloc"))
            .collect()[0][0]
        )
        assert total == budget


def test_neyman_all_constant_is_null(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 1.0), ("b", 2.0), ("b", 2.0)], "g string, v double"
    )
    out = neyman_allocation(df, "g", "v", 10).collect()
    assert all(r["alloc_share"] is None and r["n_alloc"] is None for r in out)


def test_neyman_empty(spark):
    df = spark.createDataFrame([], "g string, v double")
    assert neyman_allocation(df, "g", "v", 10).count() == 0
