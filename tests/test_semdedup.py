"""SemDeDup (operators/semdedup.py): keep-policy exactness on planted
duplicate groups, eps extremes, partition independence, fail-loud
cluster cap."""

from __future__ import annotations

import numpy as np
import pytest

from htm_streamer_spark.operators.semdedup import semantic_dedup


def _unit(v):
    v = np.asarray(v, dtype=np.float64)
    return (v / np.linalg.norm(v)).tolist()


def _corpus(spark):
    """Two well-separated directions, each with a 3-member near-dup
    group plus one distinct member. Distances are engineered so
    cent_sim strictly orders the group (no tie ambiguity)."""
    a = np.array([1.0, 0.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0, 0.0])
    rows = []
    # cluster around a: ids 1,2,3 mutually ~identical (tiny, increasing
    # perturbations => id 3 is farthest from the centroid), id 4 distinct
    for vid, wobble in ((1, 0.00), (2, 0.01), (3, 0.02)):
        rows.append((vid, _unit(a + wobble * np.array([0.0, 1.0, 1.0, 0.0]))))
    rows.append((4, _unit(a + 0.6 * np.array([0.0, 0.0, 0.0, 1.0]))))
    # cluster around b: ids 11,12 near-dups, id 13 distinct
    for vid, wobble in ((11, 0.00), (12, 0.015)):
        rows.append((vid, _unit(b + wobble * np.array([1.0, 0.0, 1.0, 0.0]))))
    rows.append((13, _unit(b + 0.6 * np.array([0.0, 0.0, 1.0, 0.0]))))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _verdicts(df, **kw):
    out = semantic_dedup(df, n_clusters=2, eps=0.999, train_sample=100, **kw)
    return {r.vec_id: r for r in out.collect()}


def test_keep_far_drops_prototypical_members(spark):
    v = _verdicts(_corpus(spark))
    assert len(v) == 7
    # groups land in one cluster each
    assert v[1].cluster_id == v[2].cluster_id == v[3].cluster_id == v[4].cluster_id
    assert v[11].cluster_id == v[12].cluster_id == v[13].cluster_id
    # distinct members always kept
    assert v[4].kept and v[13].kept
    # exactly one survivor per dup group, and it is the far-from-centroid one
    g1 = [v[1], v[2], v[3]]
    kept1 = [r for r in g1 if r.kept]
    assert len(kept1) == 1
    assert kept1[0].cent_sim == min(r.cent_sim for r in g1)
    g2 = [v[11], v[12]]
    kept2 = [r for r in g2 if r.kept]
    assert len(kept2) == 1
    assert kept2[0].cent_sim == min(r.cent_sim for r in g2)


def test_keep_near_is_the_inverse_policy(spark):
    v = _verdicts(_corpus(spark), keep="near")
    g1 = [v[1], v[2], v[3]]
    kept1 = [r for r in g1 if r.kept]
    assert len(kept1) == 1
    assert kept1[0].cent_sim == max(r.cent_sim for r in g1)
    assert v[4].kept and v[13].kept


def test_eps_extremes(spark):
    df = _corpus(spark)
    # eps above any attainable cosine: nothing is a duplicate
    all_kept = semantic_dedup(df, n_clusters=2, eps=1.0001, train_sample=100)
    assert all_kept.filter("NOT kept").count() == 0
    # eps below any cosine (> -1): one survivor per cluster
    one_each = semantic_dedup(df, n_clusters=2, eps=-1.0, train_sample=100)
    kept = one_each.filter("kept").groupBy("cluster_id").count().collect()
    assert sorted(r["count"] for r in kept) == [1, 1]


def test_partition_independence(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, semantic_dedup(df.repartition(1), 2, 0.999, train_sample=100).collect()))
    b = sorted(map(tuple, semantic_dedup(df.repartition(7), 2, 0.999, train_sample=100).collect()))
    assert a == b


def test_oversized_cluster_raises(spark):
    df = _corpus(spark)
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(df, n_clusters=1, eps=0.999, train_sample=100,
                       max_cluster_rows=3).collect()


def test_zero_vector_always_kept(spark):
    rows = [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = {r.vec_id: r for r in
         semantic_dedup(df, n_clusters=1, eps=0.9, train_sample=10).collect()}
    assert v[3].kept and v[3].cent_sim == 0.0
    assert sum(r.kept for r in v.values()) == 2  # one of the dup pair + the zero


def test_real_corpus_verdict_covers_every_row(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semantic_dedup(emb, n_clusters=8, eps=0.97, train_sample=1000)
    assert out.count() == emb.count()
    assert out.select("vec_id").distinct().count() == emb.count()


def test_precomputed_centroids_match_trained(spark):
    """centroids= skips training but must produce the identical verdict
    frame (the train-once-reuse-everywhere contract)."""
    from htm_streamer_spark.operators.similarity import train_coarse_quantizer

    df = _corpus(spark)
    cents = train_coarse_quantizer(df, 2, train_sample=100)
    trained = _verdicts(df)
    given = _verdicts(df, centroids=cents)
    assert set(trained) == set(given)
    for vid in trained:
        assert trained[vid] == given[vid]


def test_precomputed_centroids_shape_guard(spark):
    with pytest.raises(ValueError, match="n_clusters"):
        semantic_dedup(
            _corpus(spark), n_clusters=2, eps=0.9,
            centroids=np.eye(3, 4),
        ).collect()
