"""Near-duplicate clustering: connected components over a pair list,
so each group of mutually-near-duplicate documents gets one canonical
id (the pipeline keeps one doc per cluster — the step after pair
finding in every production dedup).

Algorithm: iterative min-label propagation (a.k.a. hash-min), the
standard Spark-native connected-components scheme (the same shape
GraphX/GraphFrames use underneath): every vertex starts labeled with
itself; each round every vertex takes the min label in its
neighborhood (including its own); converged when no label changes.
Rounds needed = graph diameter, and near-dup clusters are shallow
(diameter ≤ a few hops), so the loop terminates in 2-4 rounds in
practice; ``max_iter`` bounds the worst case.

Scale notes:
- state is one (doc_id, label) row per vertex and the edge list —
  never an adjacency matrix;
- each round is one shuffle join edge⋈label + one groupBy min —
  both partition on doc_id, so co-partitioning is reused;
- the convergence check is a count of changed labels (an aggregate,
  not a collect of labels);
- intermediate label frames are checkpointed via localCheckpoint
  every few rounds to truncate the lineage (an iterative plan that
  is never cut grows exponentially in the optimizer).

Reference analog: duplicate-key grouping of the uniqueness check
(/root/reference/htm_streamer/validation.py) generalized to a
similarity graph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    checkpoint_every: int = 3,
) -> DataFrame:
    """(doc_id, cluster_id): cluster_id = min doc_id reachable from
    doc_id over the undirected edge list. Vertices = every id appearing
    in the edge list (isolated docs are not emitted; callers union them
    back with cluster_id = doc_id if a total mapping is needed)."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    # localCheckpoint, not persist: a cache truncates COMPUTE but every
    # round's action still re-analyzes the full upstream logical tree
    # (measured 80s for a 6-edge graph whose lineage was the whole
    # minhash pipeline — Catalyst re-optimization per round, not data).
    # The checkpoint cuts the lineage so each round plans against a
    # leaf. Same storage footprint as the persist it replaces.
    #
    # Fault-tolerance trade (deliberate): localCheckpoint blocks are
    # NON-recomputable — on a real cluster, losing an executor mid-loop
    # fails the job instead of transparently recomputing, whereas the
    # old persist() would recompute the lost partitions. The edge frame
    # is pair-sized (LSH survivors, orders of magnitude below the
    # corpus), so a rare executor loss costs one operator re-run; the
    # per-round replanning the checkpoint eliminates costs EVERY run.
    # When spark.sparkContext.setCheckpointDir points at reliable
    # storage, a deployment that cannot tolerate job restarts should
    # swap these for reliable .checkpoint() — same plan shape, blocks
    # survive executor loss. Block lifetime: released by driver GC of
    # the DataFrame (documented in GRAPH notes round 4).
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("a").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    prev = None
    converged = False
    for i in range(max_iter):
        # neighbor minimum: for each vertex, the smallest label among
        # itself and its neighbors
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("a", "id")
        )
        # persist: the convergence count and the next round's join both
        # read this frame — without it each round recomputes the whole
        # iteration history
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
            .persist()
        )
        changed = new_labels.filter(F.col("new_label") < F.col("label")).count()
        if prev is not None:
            prev.unpersist()
        prev = new_labels
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if (i + 1) % checkpoint_every == 0:
            # cut the lineage: an iterative plan that is never truncated
            # grows with every round and eventually dominates planning
            labels = labels.localCheckpoint(eager=True)
        if changed == 0:
            converged = True
            break
    # checkpoint the final frame too: the returned plan otherwise drags
    # the whole (exponentially self-referencing) iteration lineage into
    # every downstream query that joins against it
    labels = labels.localCheckpoint(eager=True)
    if prev is not None:
        prev.unpersist()
    if not converged:
        # min-label propagation moves the min one hop per round, so a
        # component whose min-vertex eccentricity exceeds max_iter would
        # otherwise be SILENTLY split into several clusters — downstream
        # dedup would keep multiple "canonical" docs from one chain.
        # Fail loud; callers with deep graphs raise max_iter.
        raise RuntimeError(
            f"connected_components did not converge in max_iter={max_iter} "
            "rounds (a component's diameter exceeds the round budget); "
            "labels would be split mid-chain — increase max_iter"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Total dedup mapping over the corpus: (doc_id, cluster_id,
    is_canonical). Docs in no near-dup pair are their own cluster.
    The canonical representative is the cluster's min doc_id — the row
    a pipeline keeps."""
    cc = connected_components(pairs, src, dst)
    mapped = docs.select("doc_id").join(cc, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )
    return mapped.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def dedup_clusters_by(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str,
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Keep-BEST dedup mapping: like :func:`dedup_clusters`, but the
    canonical representative of each cluster is its max-``score_col``
    member (tie-broken by min doc_id) — what a production pipeline
    actually keeps (the highest-quality copy, not the lexically first).

    One extra aggregation over the cluster mapping: ``max_by`` picks
    the winner per cluster (partial-merged map-side — the shuffle
    carries one (cluster, winner) row per cluster), then a broadcast-
    eligible join marks members. Asymptotics identical to
    dedup_clusters; the quality column rides the first join only.
    """
    cc = connected_components(pairs, src, dst)
    mapped = docs.select("doc_id", score_col).join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        F.col(score_col),
    )
    # winner = (max score, then min doc_id): mixed-direction order, so
    # two partial-merged aggs instead of one max_by struct (whose
    # lexicographic order can't descend on one field and ascend on the
    # other for arbitrary id types)
    best_score = mapped.groupBy("cluster_id").agg(
        F.max(score_col).alias("_best_score")
    )
    winners = (
        mapped.join(best_score, "cluster_id")
        .filter(F.col(score_col) == F.col("_best_score"))
        .groupBy("cluster_id")
        .agg(F.min("doc_id").alias("_winner"))
    )
    return (
        mapped.join(winners, "cluster_id")
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("_winner")).alias("is_canonical"),
        )
    )


def incremental_components(
    labels: DataFrame,
    new_edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """Merge a DELTA batch of near-dup pairs into an existing
    (doc_id, cluster_id) labeling — the daily-ingest shape: at 10^12
    docs a nightly crawl drop adds ~10^8 pairs, and re-running
    :func:`connected_components` over the whole accumulated edge list
    re-propagates labels across the entire corpus every night. This
    operator's iterative work touches only the delta and the clusters
    it lands in; every untouched cluster's rows pass through in a
    single anti-join, never entering a propagation round.

    Construction: an existing cluster is exactly the star graph
    ``member -> cluster_id`` (depth 1, and cluster_id is the min member
    by :func:`connected_components`' contract). So CC over
    ``(affected stars) ∪ (delta edges)`` yields min-reachable-doc_id
    labels over the MERGED components — identical to a full recompute
    (pinned in tests/test_clustering_incremental.py) — and because
    stars have depth 1, the subgraph's diameter is bounded by the
    delta's chain length + 2, so the round count stays small no matter
    how big the old clusters are.

    Affected set = clusters containing any delta endpoint (two
    semi-joins); delta endpoints never seen before enter as their own
    vertices. Returns the full updated (doc_id, cluster_id) mapping.
    """
    delta_ids = (
        new_edges.select(F.col(src).alias("doc_id"))
        .union(new_edges.select(F.col(dst).alias("doc_id")))
        .distinct()
    )
    touched = (
        labels.join(delta_ids, "doc_id", "left_semi")
        .select("cluster_id")
        .distinct()
    )
    affected = labels.join(touched, "cluster_id", "left_semi").persist()
    stars = affected.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(src), F.col("cluster_id").alias(dst)
    )
    # singleton clusters have no star edge; keep their vertex alive via
    # a self-loop only if it's a delta endpoint (otherwise untouched).
    # Checkpoint before the CC: the sub frame is delta-sized but its
    # LINEAGE is the caller's whole candidate pipeline, and the CC loop
    # re-plans its input every round (see the sym note above).
    sub = stars.unionByName(new_edges.select(src, dst)).localCheckpoint(eager=True)
    merged = connected_components(sub, src, dst, max_iter=max_iter)
    untouched = labels.join(touched, "cluster_id", "left_anti")
    out = untouched.unionByName(merged).localCheckpoint(eager=True)
    affected.unpersist()
    return out
