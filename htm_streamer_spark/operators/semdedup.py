"""Semantic deduplication (SemDeDup): k-means-blocked within-cluster
cosine pruning of an embedding corpus.

Public recipe (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540): cluster
the embeddings with k-means, compute pairwise cosine similarity ONLY
within each cluster, and drop all but one member of every
above-threshold duplicate group. The paper's keep policy — retain the
member with the LOWEST similarity to its centroid ("keep the least
prototypical") — is the default here (``keep='far'``), with
``keep='near'`` as the inverse.

This complements the LSH near-dup path (similarity.embedding_near_
duplicates): LSH blocks by random-hyperplane signature and returns the
PAIRS; SemDeDup blocks by learned cluster and returns the per-document
KEEP/DROP verdict a curation pipeline applies directly.

Scale shape (the 100-TB story):
- centroid training is the bounded seeded md5-hash sample used by IVF
  (similarity.train_coarse_quantizer) — partition-layout independent,
  vector column only, never a row collect;
- assignment is one numpy matmul per Arrow batch (similarity.
  ivf_assign_arrow) — no per-row Python;
- the O(m^2) pairwise work is confined to one cluster per task via
  ``applyInPandas`` (one shuffle on cluster_id). ``n_clusters`` is the
  knob that bounds m; a cluster exceeding ``max_cluster_rows`` raises
  (fail loud, like clustering.connected_components) instead of silently
  attempting an unbounded m x m matrix on one executor.

Determinism: the sample is content-hash ordered, Lloyd is seeded, and
each cluster's members are sorted by id before the matmul, so the
output is bit-deterministic across partitionings — golden-parquet
oracle material (tools/make_goldens.py), same as IVF/PQ.

Reference analog: none — the reference (gotham29/htm_streamer) has no
embedding operators; this is part of the LLM-training-data toolkit the
Spark engine adds on top of the §2 inventory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.operators.similarity import (
    ivf_assign_arrow,
    train_coarse_quantizer,
)

OUT_SCHEMA = "{id} {id_type}, cluster_id int, cent_sim double, kept boolean"


def semantic_dedup(
    corpus: DataFrame,
    n_clusters: int,
    eps: float = 0.95,
    *,
    keep: str = "far",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 100_000,
    seed: int = 42,
    max_cluster_rows: int = 100_000,
) -> DataFrame:
    """Per-document semantic-dedup verdicts over an embedding corpus.

    Returns (id_col, cluster_id, cent_sim, kept): every input row, its
    cluster, its cosine similarity to the cluster centroid, and whether
    the SemDeDup policy keeps it. A row is DROPPED iff some other member
    of its cluster has cosine >= ``eps`` with it AND ranks ahead of it
    in the keep order (``keep='far'``: ascending cent_sim — the paper's
    "keep least prototypical"; ``keep='near'``: descending). Ties break
    on id, so the verdict is total and deterministic.

    Zero vectors normalize to all-zero (cosine 0 with everything) and
    are always kept.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    cents = train_coarse_quantizer(
        corpus, n_clusters, train_sample=train_sample, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    assigned = ivf_assign_arrow(corpus, cents, [id_col], vec_col, "cluster_id")
    id_type = dict(corpus.dtypes)[id_col]
    out_schema = OUT_SCHEMA.format(id=id_col, id_type=id_type)
    descending = keep == "near"
    eps_f = float(eps)
    cap = int(max_cluster_rows)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m > cap:
            raise RuntimeError(
                f"semantic_dedup cluster {int(pdf['cluster_id'].iloc[0])} has "
                f"{m} members > max_cluster_rows={cap}: the m^2 pairwise pass "
                "would not fit one task — raise n_clusters (or the cap)"
            )
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        c = cents[int(pdf["cluster_id"].iloc[0])]
        cent_sim = V @ c
        # keep order: rank 0 is kept unconditionally; row i is dropped iff
        # cos(i, j) >= eps for some j ranked before it
        key = -cent_sim if descending else cent_sim
        order = np.lexsort((np.arange(m), key))  # id asc already via sort above
        rank = np.empty(m, dtype=np.int64)
        rank[order] = np.arange(m)
        S = V @ V.T
        ahead = rank[None, :] < rank[:, None]  # [i, j] True iff j ranked before i
        dropped = ((S >= eps_f) & ahead).any(axis=1)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cluster_id": pdf["cluster_id"].astype("int32"),
                "cent_sim": cent_sim,
                "kept": ~dropped,
            }
        )

    return assigned.groupBy("cluster_id").applyInPandas(prune, schema=out_schema)
