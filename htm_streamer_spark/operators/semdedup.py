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
  ``applyInArrow`` (one shuffle on cluster_id). ``n_clusters`` is the
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
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """Per-document semantic-dedup verdicts over an embedding corpus.

    Returns (id_col, cluster_id, cent_sim, kept): every input row, its
    cluster, its cosine similarity to the cluster centroid, and whether
    the SemDeDup policy keeps it. A row is DROPPED iff some other member
    of its cluster has cosine >= ``eps`` with it AND ranks ahead of it
    in the keep order (``keep='far'``: ascending cent_sim — the paper's
    "keep least prototypical"; ``keep='near'``: descending). Ties break
    on id, so the verdict is total and deterministic.

    ``centroids`` (shape (n_clusters, dim), unit-normalized — e.g. the
    output of ``train_coarse_quantizer``) skips the training step: at
    corpus scale the quantizer is trained ONCE per corpus snapshot and
    reused across dedup runs/eps sweeps, so the serial training cost
    amortizes to zero — same contract as IVF's reusable coarse
    quantizer. When given, it must have ``n_clusters`` rows.

    Zero vectors normalize to all-zero (cosine 0 with everything) and
    are always kept.
    """
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        if cents.shape[0] != n_clusters:
            raise ValueError(
                f"centroids has {cents.shape[0]} rows, expected n_clusters={n_clusters}"
            )
    else:
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

    def prune(tbl):
        # Arrow-native group kernel (applyInArrow): the vector column
        # flattens to ONE contiguous numpy buffer — no object-dtype
        # pandas Series of 1M tiny arrays (that conversion dominated the
        # distributed stage before Spark ever reached the matmul)
        import pyarrow as pa

        m = tbl.num_rows
        if m > cap:
            raise RuntimeError(
                f"semantic_dedup cluster {tbl['cluster_id'][0].as_py()} has "
                f"{m} members > max_cluster_rows={cap}: the m^2 pairwise pass "
                "would not fit one task — raise n_clusters (or the cap)"
            )
        ids = tbl[id_col].combine_chunks()
        flat = tbl[vec_col].combine_chunks().flatten().to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        V = flat.reshape(m, flat.size // m) if m else flat.reshape(0, 0)
        by_id = np.argsort(ids.to_numpy(zero_copy_only=False), kind="stable")
        ids = ids.take(pa.array(by_id))
        V = V[by_id]
        norms = np.linalg.norm(V, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        V = V / norms
        c = cents[tbl["cluster_id"][0].as_py()]
        cent_sim = V @ c  # float64: the published column and the rank key
        # keep order: rank 0 is kept unconditionally; row i is dropped iff
        # cos(i, j) >= eps for some j ranked before it. Processing rows in
        # rank order lets the pairwise pass run block-against-prefix —
        # ~m^2/2 MACs instead of the full symmetric m^2 gemm, and no
        # m x m rank-comparison temporaries. The similarity gemm runs in
        # float32 (the >=eps test needs ~1e-3 resolution, not 1e-15;
        # single-thread f32 gemm is 2-4x the f64 rate on this host) while
        # cent_sim stays float64 so the output columns are unchanged.
        key = -cent_sim if descending else cent_sim
        order = np.lexsort((np.arange(m), key))  # id asc already via sort above
        Vr = np.ascontiguousarray(V[order], dtype=np.float32)
        dropped_r = np.zeros(m, dtype=bool)
        B = 1024
        for s in range(0, m, B):
            blk = Vr[s : s + B]
            if s:  # block vs all earlier-ranked rows
                hit = (blk @ Vr[:s].T >= eps_f).any(axis=1)
            else:
                hit = np.zeros(len(blk), dtype=bool)
            S_in = blk @ blk.T  # within-block: strictly-lower triangle only
            hit |= (np.tril(S_in >= eps_f, k=-1)).any(axis=1)
            dropped_r[s : s + len(blk)] = hit
        dropped = np.empty(m, dtype=bool)
        dropped[order] = dropped_r
        return pa.table(
            {
                id_col: ids,
                "cluster_id": pa.array(
                    np.full(m, tbl["cluster_id"][0].as_py(), dtype=np.int32)
                ),
                "cent_sim": pa.array(cent_sim, type=pa.float64()),
                "kept": pa.array(~dropped),
            }
        )

    return assigned.groupBy("cluster_id").applyInArrow(prune, schema=out_schema)
