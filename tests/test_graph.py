"""PageRank (operators/graph.py): python power-iteration parity
(including dangling-mass redistribution), mass conservation, parallel
edges, determinism across partitionings, guards, empty."""

import numpy as np
import pytest

from htm_streamer_spark.operators.graph import knn_edges, pagerank
from pyspark.sql import functions as F


def _py_pagerank(edges, n_iter=10, d=0.85):
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = sum(r[idx[v]] for v in ids if v not in out)
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out[s]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in ids}


EDGES = [
    (1, 2), (2, 3), (3, 1), (1, 3), (4, 1),
    (5, 4), (2, 5),
    (6, 1),  # 7 is dangling: appears only as dst
    (1, 7),
]


def _spark_ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank(df, **kw).toPandas().set_index("id")["rank"]
    return out.to_dict()


def test_matches_python_reference_with_dangling(spark):
    got = _spark_ranks(spark, EDGES, n_iter=10)
    want = _py_pagerank(EDGES, n_iter=10)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12), v
    # vertex 7 has no out-edges: its mass must be redistributed, not lost
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_mass_conserved_every_config(spark):
    for n_iter, d in [(1, 0.85), (7, 0.5), (15, 0.99)]:
        got = _spark_ranks(spark, EDGES, n_iter=n_iter, damping=d)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9), (n_iter, d)
        want = _py_pagerank(EDGES, n_iter=n_iter, d=d)
        for v in want:
            assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_parallel_edges_carry_double_mass(spark):
    # u -> v twice: v receives 2/3 of u's emitted mass, w gets 1/3
    edges = [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)]
    got = _spark_ranks(spark, edges, n_iter=8)
    want = _py_pagerank_multi(edges, n_iter=8)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert got[2] > got[3]


def _py_pagerank_multi(edges, n_iter=10, d=0.85):
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dangling = sum(r[idx[v]] for v in ids if v not in out)
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out[s]
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in ids}


def test_partitioning_invariance(spark):
    df1 = spark.createDataFrame(EDGES, "src long, dst long").repartition(1)
    df7 = spark.createDataFrame(EDGES, "src long, dst long").repartition(7)
    a = pagerank(df1, n_iter=6).toPandas().set_index("id")["rank"].sort_index()
    b = pagerank(df7, n_iter=6).toPandas().set_index("id")["rank"].sort_index()
    # round to the oracle's 6-dp contract: partition-order float noise
    # must stay below it
    assert (a.round(9) == b.round(9)).all()


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df).toPandas()
    assert len(out) == 0
    assert list(out.columns) == ["id", "rank"]


def test_guards(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.0)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def test_knn_edges_drops_self_loops(spark):
    topk = spark.createDataFrame(
        [(1, 1, 1.0), (1, 2, 0.9), (2, 2, 1.0), (2, 1, 0.8)],
        "query_id long, vec_id long, cosine double",
    )
    got = knn_edges(topk).orderBy("src", "dst").collect()
    assert [(r["src"], r["dst"]) for r in got] == [(1, 2), (2, 1)]


def test_knn_edges_rerank_k(spark):
    # query 1: self made the top-3, so 3 survivors → k=2 keeps best 2;
    # query 2: self absent from its top rows → must trim 3 rows to 2
    topk = spark.createDataFrame(
        [
            (1, 1, 1.0), (1, 5, 0.9), (1, 6, 0.8), (1, 7, 0.7),
            (2, 5, 0.9), (2, 6, 0.9), (2, 7, 0.8),
        ],
        "query_id long, vec_id long, cosine double",
    )
    got = knn_edges(topk, k=2).orderBy("src", "dst").collect()
    assert [(r["src"], r["dst"]) for r in got] == [
        (1, 5), (1, 6),
        (2, 5), (2, 6),  # tie at 0.9 broken by id ASC
    ]


def test_brute_force_arrow_equals_expression_form(spark):
    # the matmul form must reproduce the expression baseline EXACTLY
    # (ids and ranks; cosines to float tolerance) on the real fixture
    from htm_streamer_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_arrow,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding").limit(200)
    a = brute_force_topk(emb, q, k=6).toPandas()
    b = brute_force_topk_arrow(emb, q, k=6).toPandas()
    key = ["query_id", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert list(a["vec_id"]) == list(b["vec_id"])
    assert list(a["rank"]) == list(b["rank"])
    # ids/ranks (what feeds the graph) are EXACTLY equal; cosine
    # magnitudes differ at f32 epsilon — the expression form multiplies
    # float32 elements before the double fold, the kernel promotes to
    # float64 first
    assert (a["cosine"] - b["cosine"]).abs().max() < 2e-6


def test_brute_force_arrow_empty_queries(spark):
    from htm_streamer_spark.operators.similarity import brute_force_topk_arrow
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.select(F.col("vec_id").alias("query_id"), "embedding").filter(F.lit(False))
    out = brute_force_topk_arrow(emb, q, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "vec_id", "cosine", "rank"]
