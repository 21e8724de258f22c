"""Two-pass Misra-Gries heavy hitters (operators/heavy.py): the
candidate superset guarantee, exactness of the recount, and partition-
layout independence."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from htm_streamer_spark.operators.heavy import (
    heavy_hitters,
    misra_gries_candidates,
)


def _values_df(spark, counts: dict, n_parts: int):
    rows = [(v,) for v, c in sorted(counts.items()) for _ in range(c)]
    return spark.createDataFrame(rows, "value string").repartition(n_parts)


COUNTS = {f"hot{i}": 400 - 30 * i for i in range(8)}
COUNTS.update({f"cold{i:03d}": 1 + (i % 3) for i in range(200)})


@pytest.mark.parametrize("n_parts", [1, 7])
def test_topk_exact_when_guarantee_holds(spark, n_parts):
    df = _values_df(spark, COUNTS, n_parts)
    top, thr = heavy_hitters(df, "value", k=8, sketch_k=64)
    got = [(r["value"], r["cnt"]) for r in top.collect()]
    exact = sorted(COUNTS.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    assert got == exact
    t = thr.collect()[0]
    assert t["n_total"] == sum(COUNTS.values())
    # the k-th count must beat the bound for the exactness claim
    assert got[-1][1] > t["guarantee_bound"]


def test_candidate_superset_under_tiny_sketch(spark):
    # sketch_k=4 on 7 partitions: candidates must still contain every
    # value whose GLOBAL count exceeds N/sketch_k (pigeonhole bound)
    df = _values_df(spark, COUNTS, 7)
    cands = {
        r["value"]
        for r in misra_gries_candidates(df, "value", sketch_k=4).collect()
    }
    n = sum(COUNTS.values())
    for v, c in COUNTS.items():
        if c > n / 4:
            assert v in cands
    # and the sketch is bounded: at most sketch_k rows per partition
    per_part = (
        misra_gries_candidates(df, "value", sketch_k=4)
        .withColumn("p", F.spark_partition_id())
        .groupBy("p")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_part <= 4


def test_recount_is_exact_not_lower_bound(spark):
    # MG lower bounds undercount; the pass-2 numbers must be EXACT
    df = _values_df(spark, COUNTS, 7)
    lb = {
        r["value"]: r["lb"]
        for r in misra_gries_candidates(df, "value", sketch_k=16).collect()
        if r["value"] == "hot0"
    }
    top, _ = heavy_hitters(df, "value", k=1, sketch_k=16)
    assert top.collect()[0]["cnt"] == COUNTS["hot0"]
    if lb:
        assert lb["hot0"] <= COUNTS["hot0"]


def test_empty_input(spark):
    df = spark.createDataFrame([], "value string")
    top, thr = heavy_hitters(df, "value", k=5, sketch_k=8)
    assert top.count() == 0
    assert thr.collect()[0]["n_total"] == 0


def test_nulls_ignored_in_candidates(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "value string"
    )
    top, _ = heavy_hitters(df, "value", k=5, sketch_k=8)
    got = [(r["value"], r["cnt"]) for r in top.collect()]
    assert got == [("a", 2), ("b", 1)]
