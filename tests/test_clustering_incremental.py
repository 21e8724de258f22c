"""incremental_components (operators/clustering.py): merging a delta
edge batch into an existing labeling equals the full recompute, only
touched clusters enter the propagation, and the degenerate shapes
(new-docs-only, cluster merges, empty delta) hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.operators.clustering import (
    connected_components,
    incremental_components,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def _cc_map(df):
    return {r["doc_id"]: r["cluster_id"] for r in df.collect()}


def test_incremental_equals_full_recompute_synthetic(spark):
    old = _pairs(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)])
    delta = _pairs(spark, [(3, 10), (40, 41), (21, 42)])
    labels = connected_components(old)
    got = _cc_map(incremental_components(labels, delta))
    want = _cc_map(connected_components(old.unionByName(delta)))
    assert got == want
    # the 1-2-3 chain merged with 10-11 under min id 1
    assert got[11] == 1
    # brand-new docs formed their own cluster
    assert got[40] == 40 and got[41] == 40
    # 42 joined the 20-21 cluster
    assert got[42] == 20


def test_incremental_equals_full_on_real_minhash_pairs(spark):
    from htm_streamer_spark.operators.dedup import minhash_near_duplicates

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = (
        minhash_near_duplicates(docs, jaccard_threshold=0.5)
        .select("doc_a", "doc_b")
        .persist()
    )
    old = pairs.filter((F.col("doc_a") + F.col("doc_b")) % 4 != 0)
    delta = pairs.filter((F.col("doc_a") + F.col("doc_b")) % 4 == 0)
    assert delta.count() > 0 and old.count() > 0
    labels = connected_components(old)
    got = _cc_map(incremental_components(labels, delta))
    want = _cc_map(connected_components(pairs))
    assert got == want


def test_untouched_clusters_stay_out_of_the_subgraph(spark):
    old = _pairs(spark, [(1, 2), (10, 11), (20, 21)])
    delta = _pairs(spark, [(2, 3)])
    labels = connected_components(old)
    out = incremental_components(labels, delta)
    got = _cc_map(out)
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}
    # the subgraph CC saw only cluster {1,2} + delta (vertices 1,2,3) —
    # the structural "untouched rows never propagate" claim is pinned
    # by test_round_count_bounded_by_delta_not_cluster_size, which
    # would fail if untouched chains entered the rounds


def test_round_count_bounded_by_delta_not_cluster_size(spark):
    # one big old cluster (chain of 60 merged into a star) + 1 new edge:
    # full recompute over the raw chain needs ~30 rounds; the
    # incremental subgraph is a depth-1 star + 1 edge and must converge
    # within a tiny max_iter
    chain = _pairs(spark, [(i, i + 1) for i in range(60)])
    labels = connected_components(chain, max_iter=65)
    delta = _pairs(spark, [(60, 100)])
    got = _cc_map(incremental_components(labels, delta, max_iter=4))
    assert got[100] == 0 and got[60] == 0 and len(got) == 62


def test_empty_delta_returns_labels(spark):
    old = _pairs(spark, [(1, 2), (10, 11)])
    labels = connected_components(old)
    delta = _pairs(spark, [(0, 0)]).filter(F.lit(False))
    got = _cc_map(incremental_components(labels, delta))
    assert got == _cc_map(labels)
