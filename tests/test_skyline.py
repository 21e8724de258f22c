"""2-D Pareto frontier (operators/skyline.py) vs a brute-force O(n^2)
reference, plus the boundary semantics: coordinate ties, duplicate
points, total dominance, and NULL exclusion."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.skyline import pareto_frontier


def _brute(points):
    """ids of non-dominated points under maximize-(x, y)."""
    out = []
    for i, (pid, x, y) in enumerate(points):
        dominated = any(
            qx >= x and qy >= y and (qx > x or qy > y)
            for j, (_, qx, qy) in enumerate(points)
            if j != i
        )
        if not dominated:
            out.append(pid)
    return sorted(out)


def _run(spark, points, repartition=None):
    pdf = pd.DataFrame(points, columns=["i", "x", "y"])
    df = spark.createDataFrame(pdf)
    if repartition:
        df = df.repartition(repartition)
    return sorted(r["i"] for r in pareto_frontier(df, "i", "x", "y").collect())


def test_matches_brute_force_random_with_ties(spark):
    rng = np.random.default_rng(4)
    # integer grid -> plenty of ties on both axes
    pts = [
        (i, int(rng.integers(0, 20)), int(rng.integers(0, 20)))
        for i in range(300)
    ]
    assert _run(spark, pts, repartition=7) == _brute(pts)


def test_anticorrelated_chain_all_survive(spark):
    # strictly decreasing y over increasing x: nothing dominates
    pts = [(i, i, 100 - i) for i in range(50)]
    assert _run(spark, pts) == list(range(50))


def test_total_dominance_and_duplicates(spark):
    pts = [(0, 10, 10), (1, 10, 10), (2, 5, 9), (3, 10, 9), (4, 9, 10)]
    # (10,10) dominates everything else; the duplicate pair both stay
    assert _run(spark, pts) == [0, 1]


def test_equal_x_keeps_only_max_y(spark):
    pts = [(0, 5, 1), (1, 5, 3), (2, 5, 2)]
    assert _run(spark, pts) == [1]


def test_nulls_excluded(spark):
    pdf = pd.DataFrame(
        {"i": [0, 1, 2], "x": [1.0, None, 99.0], "y": [1.0, 99.0, None]}
    )
    out = _run_df(spark, pdf)
    assert out == [0]


def _run_df(spark, pdf):
    df = spark.createDataFrame(pdf)
    return sorted(r["i"] for r in pareto_frontier(df, "i", "x", "y").collect())


def test_single_and_empty(spark):
    assert _run(spark, [(7, 1, 1)]) == [7]
    pdf = pd.DataFrame({"i": [1], "x": [1.0], "y": [1.0]})
    df = spark.createDataFrame(pdf).limit(0)
    assert pareto_frontier(df, "i", "x", "y").count() == 0
