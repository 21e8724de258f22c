"""Connected-components / dedup-cluster tests: known graphs, chains
longer than one propagation round, convergence, and the total mapping."""

from __future__ import annotations

from htm_streamer_spark.operators.clustering import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_two_components_and_isolated(spark):
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # a 9-hop chain: hash-min needs several rounds; must still converge
    edges = _edges(spark, [(i, i + 1) for i in range(10)])
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert set(got.values()) == {0}
    assert len(got) == 11


def test_max_iter_exhaustion_raises(spark):
    # a 9-hop chain cannot converge in 3 rounds of one-hop min
    # propagation — the old behavior silently returned a SPLIT chain
    # (several "clusters" from one component); now it must fail loud
    import pytest

    edges = _edges(spark, [(i, i + 1) for i in range(10)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=3)


def test_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(5, 2), (2, 8)])).collect()
    b = connected_components(_edges(spark, [(2, 5), (8, 2)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_dedup_clusters_by_keeps_best(spark):
    from htm_streamer_spark.operators.clustering import dedup_clusters_by
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, 0.3), (1, 0.9), (2, 0.5), (3, 0.9), (4, 0.1), (5, 0.7)],
        "doc_id long, quality double",
    )
    # cluster {0,3,5}: best quality 0.9 → doc 3; {1}: itself; {2}; {4}
    pairs = _edges(spark, [(0, 3), (3, 5)])
    got = {
        r.doc_id: (r.cluster_id, r.is_canonical)
        for r in dedup_clusters_by(docs, pairs, "quality").collect()
    }
    assert got == {
        0: (0, False),
        1: (1, True),
        2: (2, True),
        3: (0, True),   # highest quality wins, not min doc_id
        4: (4, True),
        5: (0, False),
    }
    # tie on score → min doc_id among the tied
    docs2 = spark.createDataFrame(
        [(0, 0.9), (3, 0.9), (5, 0.2)], "doc_id long, quality double"
    )
    got2 = {
        r.doc_id: r.is_canonical
        for r in dedup_clusters_by(docs2, pairs, "quality").collect()
    }
    assert got2 == {0: True, 3: False, 5: False}


def test_dedup_clusters_total_mapping(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = _edges(spark, [(0, 3), (3, 5)])
    got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs, pairs).collect()}
    assert got == {
        0: (0, True),
        1: (1, True),
        2: (2, True),
        3: (0, False),
        4: (4, True),
        5: (0, False),
    }
