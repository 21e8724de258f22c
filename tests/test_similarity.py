"""Similarity search: brute-force cosine top-k (exact baseline) and
random-hyperplane LSH ANN (scale path), on the driver's embeddings
table."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.similarity import (
    brute_force_topk,
    cosine_expr,
    embedding_near_duplicates,
    lsh_topk,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return (
        emb.filter(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), "embedding")
    )


def test_cosine_expr_matches_numpy(spark, emb):
    rows = emb.limit(2).collect()
    a, b = np.array(rows[0]["embedding"]), np.array(rows[1]["embedding"])
    want = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    got = (
        emb.limit(1)
        .select(
            cosine_expr(
                F.array(*[F.lit(float(x)) for x in a]),
                F.array(*[F.lit(float(x)) for x in b]),
            ).alias("c")
        )
        .collect()[0]["c"]
    )
    assert abs(got - want) < 1e-6


def test_brute_force_self_is_top1(emb, queries):
    top = brute_force_topk(emb, queries, k=3).filter(F.col("rank") == 1).collect()
    for r in top:
        assert r["vec_id"] == r["query_id"]  # self-similarity = 1.0
        assert abs(r["cosine"] - 1.0) < 1e-6


def test_lsh_recall_vs_brute_force(emb, queries):
    dim = len(emb.first()["embedding"])
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, dim=dim, k=5, bits=8, probe_hamming=2).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    # self must always be found (identical vector shares every bucket)
    for q, s in approx_sets.items():
        assert q in s
    # aggregate recall over all queries should be substantial
    hits = sum(len(exact_sets[q] & approx_sets.get(q, set())) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total > 0.3, f"LSH recall too low: {hits}/{total}"


def test_embedding_near_duplicates_finds_planted(spark, emb):
    dim = len(emb.first()["embedding"])
    # plant an exact duplicate vector with a new id
    dup = emb.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    with_dup = emb.unionByName(dup)
    pairs = embedding_near_duplicates(with_dup, dim=dim, threshold=0.999).collect()
    ids = {(r["id_a"], r["id_b"]) for r in pairs}
    orig = emb.first()["vec_id"]
    assert (orig, orig + 1_000_000) in ids
