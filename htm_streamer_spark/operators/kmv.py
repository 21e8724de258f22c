"""KMV (k-minimum-values) bottom-k sketches: distinct counts, pairwise
Jaccard, and containment between groups at sketch cost.

The exact cross-source overlap operators (``contamination.py``
cross_source_overlap, ``lm.py`` topk_overlap_sources) join the full
distinct-item frames — right when the answer must be exact, but at
10^12 rows the (source, item) collapse is itself corpus-sized. The KMV
sketch (Bar-Yossef et al. 2002; Beyer et al. 2007 "Distinct-value
synopses") keeps only the k SMALLEST hash values per group: a bottom-k
signature that is (a) mergeable (bottom-k of a union = bottom-k of the
concatenated signatures), (b) an unbiased distinct-count estimator
``D̂ = (k−1)/u_(k)`` with relative error ~1/√(k−2), and (c) a Jaccard
estimator — the k-union's members that belong to BOTH sides are a
uniform sample of the union, so ``Ĵ = |M_k(A∪B) ∩ A ∩ B| / k``.

HLL (``stats.py`` approx tier) answers "how many distinct" one group
at a time; KMV additionally answers "how much do two groups SHARE"
— the sketch tier of the dedup/contamination family.

Everything is deterministic (the hash is the md5-60bit convention
proven cross-engine in the SimHash kernel), so the DuckDB oracle
recomputes the sketches and estimates EXACTLY — no tolerance needed.

Scale shape: one scan collapses to (group, hash) [map-side combinable
distinct], one per-group sort window keeps k rows; every pairwise
estimate runs on the groups×k signature frame (metadata-sized: 1000
sources × 256 hashes = 256k rows, whatever the corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of md5 — bit-identical in DuckDB
HASH_SPACE = float(1 << HASH_BITS)


def _hash60(col) -> F.Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k sketch: (group, n_kept, kth_u, est_distinct).

    ``n_kept`` < k means the group had fewer than k distinct items and
    the estimate is EXACT (= n_kept). ``kth_u`` is the k-th smallest
    hash mapped to (0, 1]; ``est_distinct = (k−1)/kth_u`` otherwise.
    The signature rows themselves are returned by ``kmv_members`` for
    pairwise use — this frame is the per-group readout.
    """
    m = kmv_members(df, group_col, item_col, k)
    agg = m.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("h").alias("_hk"),
    )
    u = (F.col("_hk").cast("double") + F.lit(1.0)) / F.lit(HASH_SPACE)
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
        F.lit(float(k - 1)) / u
    )
    return agg.select(
        group_col,
        "n_kept",
        F.round(u + F.lit(1e-9), 9).alias("kth_u"),
        F.round(est + F.lit(1e-9), 6).alias("est_distinct"),
    )


def kmv_members(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 256,
) -> DataFrame:
    """(group, h): the ≤k smallest distinct 60-bit item hashes per
    group — the signature rows every estimator derives from. One
    map-side-combinable distinct + one per-group sort window (the
    window input is the (group, distinct-hash) collapse, not the fact
    table)."""
    distinct = (
        df.select(F.col(group_col), _hash60(F.col(item_col)).alias("h"))
        .groupBy(group_col, "h")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        distinct.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def kmv_pairwise_jaccard(
    members: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise Jaccard/containment estimates from bottom-k signatures:
    (group_a, group_b, n_union_k, n_both, est_jaccard) for every
    unordered pair (a < b).

    The k smallest hashes of A∪B (= bottom-k of the two signatures
    merged) are a uniform random sample of the union; the fraction
    present in BOTH signatures estimates J. When the merged union has
    fewer than k distinct hashes both sketches were exact, and so is
    the estimate (n_union_k is the true union size). All frames are
    groups×k — nothing here ever touches the corpus.
    """
    g = group_col
    # The members frame is referenced FOUR times below (a, b, and twice
    # via pairs). Without a lineage cut each reference re-runs the whole
    # upstream sketch build — at corpus scale that is several full scans
    # for a groups×k result. localCheckpoint materializes the signature
    # once; the frame is metadata-sized (groups×k rows, e.g. 1000×256),
    # so the non-recomputable-blocks caveat is immaterial: losing an
    # executor re-runs a seconds-long sketch job, not a corpus scan.
    members = members.localCheckpoint(eager=True)
    a = members.select(F.col(g).alias("ga"), "h")
    b = members.select(F.col(g).alias("gb"), "h")
    # union hash list per pair: full outer on h within each pair via a
    # pair-keyed union (groups×k × groups rows at most — metadata)
    pairs = (
        a.select("ga").distinct().crossJoin(b.select("gb").distinct())
        .filter(F.col("ga") < F.col("gb"))
    )
    ua = pairs.join(a, "ga").select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    ub = pairs.join(b, "gb").select("ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    merged = (
        ua.unionByName(ub)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    topk = merged.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    out = topk.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_union_k"),
        F.sum((F.col("in_a") * F.col("in_b")).cast("long")).alias("n_both"),
    )
    j = F.col("n_both").cast("double") / F.col("n_union_k").cast("double")
    return out.select(
        F.col("ga").alias(f"{g}_a"),
        F.col("gb").alias(f"{g}_b"),
        "n_union_k",
        "n_both",
        F.round(j + F.lit(1e-9), 6).alias("est_jaccard"),
    )
