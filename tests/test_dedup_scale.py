"""Dedup-pipeline integration at replicated-corpus scale: 6 near-
identical copies of every sf0.01 document (unique ids, a per-copy
suffix) must land in one cluster per replication group with exactly one
canonical — the end-to-end minhash -> LSH -> confirm -> connected-
components -> keep-one path under real candidate-pair volume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.clustering import dedup_clusters
from htm_streamer_spark.operators.dedup import minhash_near_duplicates

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_replicated_corpus_clusters_and_single_canonical(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    copies = spark.range(6).select(F.col("id").cast("int").alias("copy"))
    big = d.crossJoin(copies).select(
        (F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" copytag"), F.col("copy").cast("string")).alias(
            "text"
        ),
        "lang",
        "source",
        "n_chars",
    )
    pairs = minhash_near_duplicates(big, jaccard_threshold=0.5)
    out = dedup_clusters(big, pairs).select(
        "doc_id", "cluster_id", F.col("is_canonical").cast("int").alias("is_canonical")
    )
    rows = out.collect()
    assert len(rows) == 3000
    by_base: dict[int, set] = {}
    by_cluster: dict[int, int] = {}
    for r in rows:
        by_base.setdefault(r.doc_id % 1_000_000, set()).add(r.cluster_id)
        by_cluster[r.cluster_id] = by_cluster.get(r.cluster_id, 0) + r.is_canonical
    # connectivity: all 6 near-identical copies of a doc share a cluster
    # (clusters MAY additionally merge distinct-but-similar base docs)
    assert all(len(cids) == 1 for cids in by_base.values())
    # keep-one: exactly one canonical per cluster
    assert all(n == 1 for n in by_cluster.values()), by_cluster