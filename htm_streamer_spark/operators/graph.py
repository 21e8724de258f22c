"""Iterative graph centrality (PageRank) over DataFrame edge lists.

Training-data curation uses link-graph centrality as a quality prior
(host-level PageRank gates crawl corpora in CCNet/RefinedWeb-style
pipelines) and kNN-graph centrality as a representativeness score over
an embedding space (a point many neighbors vote for is prototypical; a
point nobody links to is an outlier or a stray cluster). The engine's
graph tier so far is connected components (``clustering.py`` — min
label propagation for dedup transitive closure); PageRank is the
weighted-importance member: not "which docs touch", but "which docs
matter".

Semantics (the classic damped random surfer, deterministic for a fixed
iteration count):

    rank_{t+1}(v) = (1-d)/N + d * ( Σ_{u→v} rank_t(u)/outdeg(u)
                                    + dangling_t / N )

where ``dangling_t`` is the total rank mass sitting on vertices with no
out-edges (redistributed uniformly — the standard teleport fix, without
which the mass leaks and ranks no longer sum to 1). Fixed ``n_iter``
rather than an epsilon stop so the result is EXACTLY reproducible by
the DuckDB oracle's recursive CTE — same iterate, same count.

Scale shape: the rank frame is VERTEX-sized, never edge-sized. Each
iteration is one edges⋈ranks hash join on src (edges persisted once;
at cluster scale pre-partition both sides by the join key so the
per-iteration shuffle moves only the vertex-sized rank frame), one
map-side-combinable groupBy(dst) sum, and one vertex-sized left join.
The dangling mass rides the same job as a broadcast 1-row aggregate
(a per-round driver action would triple the job count). Lineage is cut
with ``localCheckpoint`` every round — the rank frame is consumed three
times by the next round, so it must be materialized anyway, and an
iterative plan that is never truncated grows self-referentially until
planning time dominates (same discipline as
``clustering.connected_components``).

Reference analog: the reference has no graph operators; this is part
of the beyond-reference training-pipeline family (SURVEY §2 "beyond"
list), alongside dedup/similarity/contamination.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 10,
    checkpoint_every: int = 5,
) -> DataFrame:
    """(id, rank) after exactly ``n_iter`` damped power iterations.

    Vertices = every id appearing as src or dst. Parallel edges are
    honored (two u→v edges carry twice the mass — callers wanting
    simple-graph semantics distinct() first). Ranks sum to 1 at every
    iteration (dangling mass redistributed uniformly).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    # localCheckpoint, not persist, for every loop-invariant frame: a
    # cache truncates compute, but each iteration's action re-ANALYZES
    # the full upstream logical tree (for the bench graph, the whole
    # kNN build) — Catalyst replanning, not data, dominated the loop
    # (same find as clustering.connected_components, 10x there)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=True
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = verts.count()
    if n == 0:
        schema = f"id {edges.schema[src].dataType.simpleString()}, rank double"
        return edges.sparkSession.createDataFrame([], schema)
    deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).cast("double").alias("deg"))
        .localCheckpoint(eager=True)
    )
    base = (1.0 - damping) / n

    # ONE job per iteration: the dangling mass joins the plan as a
    # broadcast 1-row aggregate (a separate driver .first() per round
    # would triple the job count — measured 74s -> ~20s on the bench
    # graph), and localCheckpoint(eager=True) is the single
    # materializer AND the lineage cut (ranks is consumed 3x next
    # round — dangling agg, contrib join, left join — so it must be
    # materialized each round or the unpersisted subtree recomputes
    # 3^k-fold). checkpoint_every is kept for API stability; the cut
    # now happens every round, which is strictly more aggressive.
    # Storage note: each round's checkpointed blocks are freed when the
    # previous frame is garbage-collected (nothing references it after
    # the next round), so steady-state storage is ~2 vertex frames; at
    # 10^9 vertices that is GBs per executor — fits the same budget as
    # the persist+count strategy it replaces.
    del checkpoint_every
    # the dangling SET is static (out-degree never changes) — attach
    # deg to the vertex frame ONCE so each iteration needs neither the
    # left-anti dangling join nor a separate deg join: the dangling
    # mass becomes a conditional aggregate over the rank frame itself,
    # and the contribution join reads rank and deg from one frame
    # (3 joins/iteration -> 1 join + 1 vertex-sized left join)
    vd = (
        verts.join(deg, verts.id == deg.src, "left")
        .select("id", "deg")
        .localCheckpoint(eager=True)
    )
    ranks = vd.withColumn("rank", F.lit(1.0 / n)).localCheckpoint(eager=True)
    for _ in range(n_iter):
        # rank mass on vertices with no out-edges, redistributed to all
        dang = ranks.agg(
            F.coalesce(
                F.sum(F.when(F.col("deg").isNull(), F.col("rank"))), F.lit(0.0)
            ).alias("_dang")
        )
        contrib = (
            e.join(
                ranks.where(F.col("deg").isNotNull()).select(
                    F.col("id").alias("src"), "rank", "deg"
                ),
                "src",
            )
            .select("dst", (F.col("rank") / F.col("deg")).alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("contrib"))
            .withColumnRenamed("dst", "id")
        )
        new_ranks = (
            vd.join(contrib, "id", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "id",
                "deg",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("contrib", F.lit(0.0))
                        + F.col("_dang") / F.lit(float(n))
                    )
                ).alias("rank"),
            )
        )
        ranks = new_ranks.localCheckpoint(eager=True)
    return ranks.select("id", "rank")


def knn_edges(
    topk: DataFrame,
    k: int | None = None,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    score_col: str = "cosine",
) -> DataFrame:
    """Directed kNN edges (src=query, dst=neighbor) from a top-k frame
    (brute_force_topk / ivf_topk / pq_topk output), self-loops dropped.
    With ``k`` set, re-ranks the surviving neighbors under the same
    total order (score DESC, id ASC) and keeps the top k — ask the
    similarity tier for k+1 so a query whose self-row made the cut
    still yields k true neighbors. The adapter that turns the
    similarity tier's output into graph-tier input."""
    from pyspark.sql import Window

    nn = topk.filter(F.col(query_id_col) != F.col(id_col))
    if k is not None:
        w = Window.partitionBy(query_id_col).orderBy(
            F.desc(score_col), F.asc(id_col)
        )
        nn = nn.withColumn("_rn", F.row_number().over(w)).filter(
            F.col("_rn") <= k
        )
    return nn.select(
        F.col(query_id_col).alias("src"), F.col(id_col).alias("dst")
    )
