"""Deterministic sampling / splitting: content-hash assignment of rows
to train/val/test splits and per-stratum downsampling — the ops that
make a training corpus reproducible and leakage-free.

Why hash, not rand(): ``rand()`` re-draws on every retry/recompute (a
task retry would move docs between splits mid-job) and couples the
split to partitioning. A content hash of the id is stable across runs,
engines, partitionings, and cluster sizes — the SAME doc always lands
in the SAME split, which is what prevents train/test leakage when the
corpus is rebuilt. The hash is md5-derived (first 8 hex chars → 31-bit
int, the repo-standard DuckDB-reproducible recipe) so every assignment
has an exact SQL oracle; at production scale swap ``method='xxhash64'``
for the cheaper JVM hash (same structure, engine-specific values).

All ops are one narrow projection — no shuffle, no sort, no collect;
the split column is computed inside the scan's codegen stage.

Reference analog: none (the reference samples implicitly by taking the
first N rows — exactly the prefix-bias this module exists to avoid;
cf. the IVF sample-bias fix, operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 1_000_000  # split resolution: 1e-6 fraction granularity


def hash_bucket(col: Column, salt: str, method: str = "md5") -> Column:
    """Deterministic bucket in [0, HASH_BUCKETS) from (value, salt).
    ``md5``: DuckDB-reproducible (oracle path). ``xxhash64``: cheaper,
    the at-scale default."""
    keyed = F.concat(col.cast("string"), F.lit(":"), F.lit(salt))
    if method == "md5":
        h = F.conv(F.substring(F.md5(keyed), 1, 8), 16, 10).cast("long")
    elif method == "xxhash64":
        h = F.abs(F.xxhash64(keyed))
    else:
        raise ValueError(f"unknown hash method {method!r}")
    return F.pmod(h, F.lit(HASH_BUCKETS))


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    method: str = "md5",
) -> DataFrame:
    """Add a ``split`` column assigning each row to one of ``weights``'
    keys with the given proportions (must sum to ~1). Assignment is a
    pure function of (id, salt): rebuilding the corpus, changing
    partitioning, or retrying tasks never moves a doc across splits.
    Change ``salt`` to draw an independent split."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")
    b = hash_bucket(F.col(id_col), salt, method)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w
        cut = int(round(acc * HASH_BUCKETS))
        branch = F.when(b < cut, F.lit(name))
        expr = branch if expr is None else expr.when(b < cut, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "sample-v1",
    default_fraction: float = 0.0,
    method: str = "md5",
) -> DataFrame:
    """Keep a deterministic ``fractions[stratum]`` of each stratum
    (strata not listed keep ``default_fraction``). The per-stratum
    cutoff rides as a small literal map — no join, no shuffle; the
    filter runs inside the scan. Same-doc-same-decision under any
    partitioning, so incremental rebuilds keep prior members."""
    b = hash_bucket(F.col(id_col), salt, method)
    pairs = []
    for k, v in fractions.items():
        pairs += [F.lit(k), F.lit(int(round(v * HASH_BUCKETS)))]
    cut = F.coalesce(
        F.create_map(*pairs)[F.col(strata_col)],
        F.lit(int(round(default_fraction * HASH_BUCKETS))),
    )
    return df.filter(b < cut)


def global_shuffle_positions(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "shuffle-v1",
    n_buckets: int = 256,
    method: str = "md5",
) -> DataFrame:
    """Deterministic global shuffle order for training: every row gets
    a dense position 0..N-1 in content-hash order — the reproducible
    corpus shuffle every epoch-0 data loader needs (stable across
    rebuilds, retries, partitionings; re-salt for a different epoch
    order).

    Scale shape: a naive ``row_number() OVER (ORDER BY hash)`` is a
    SINGLE-PARTITION window — the whole corpus through one task. This
    uses the distributed order-index pattern instead: rows are hashed
    into ``n_buckets`` ordered buckets; per-bucket counts (one tiny
    agg) become broadcast cumulative offsets; within-bucket positions
    come from a PARTITIONED row_number window. position = offset[bucket]
    + rank_within_bucket. Two shuffles (count agg + window), both
    parallel across buckets; no global sort, no single task.

    Ties inside a bucket break on (hash, id) so the order is total and
    engine-independent. Returns (id_col, shuffle_pos).
    """
    from pyspark.sql import Window

    b = hash_bucket(F.col(id_col), salt, method)
    # referenced twice (bucket counts + positioned window): persist the
    # narrow (id, hash, bucket) frame so the source is scanned once
    bucketed = df.select(
        F.col(id_col), b.alias("__h"), F.pmod(b, F.lit(n_buckets)).cast("int").alias("__b")
    ).persist()
    # NOTE __b is derived from the hash value itself, so bucket order
    # must follow (__b) first: position ordering is (bucket, hash, id).
    counts = (
        bucketed.groupBy("__b").agg(F.count(F.lit(1)).alias("__n"))
    )
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    # the offsets frame is n_buckets rows — the single-partition window
    # here is over METADATA, not data
    offsets = counts.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_in = Window.partitionBy("__b").orderBy(F.col("__h").asc(), F.col(id_col).asc())
    return (
        bucketed.withColumn("__rn", F.row_number().over(w_in))
        .join(F.broadcast(offsets), "__b")
        .select(
            id_col,
            (F.col("__off") + F.col("__rn") - 1).cast("long").alias("shuffle_pos"),
        )
    )


def weighted_systematic_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    salt: str = "wsample-v1",
    n_buckets: int = 256,
    method: str = "md5",
) -> DataFrame:
    """Exact probability-proportional-to-size (PPS) systematic sample
    of ~``k`` rows: lay every row's integer weight end-to-end along a
    deterministic hash order and take one row at each of ``k`` evenly
    spaced points. Inclusion probability is proportional to weight —
    the classic survey-sampling design for token-weighted corpus
    subsets (a 10k-token doc is 10x likelier than a 1k-token doc).

    Why this instead of Efraimidis-Spirakis exponential keys: E-S needs
    ``ln``/``pow`` whose last-ulp behavior differs across engines, so
    selection near the k-th boundary is not bit-reproducible. This
    design is ALL integer arithmetic (prefix sums + ceiling division)
    — the same rows are chosen on any engine, any partitioning, any
    retry. Rows with non-positive weight are excluded. A row heavier
    than W/k spans several points but is returned once, so the output
    can be slightly under ``k`` (certainty items) — standard systematic
    PPS behavior.

    Scale shape (same two-phase pattern as global_shuffle_positions):
    the global prefix sum is per-bucket totals (tiny agg → broadcast
    offsets over n_buckets METADATA rows) + a PARTITIONED within-bucket
    running sum — no global sort, no single-partition window over data.
    Returns (id_col, weight, cum_before); join back on id for payloads.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    b = hash_bucket(F.col(id_col), salt, method)
    rows = (
        df.select(
            F.col(id_col),
            F.col(weight_col).cast("long").alias("__w"),
            b.alias("__h"),
            F.pmod(b, F.lit(n_buckets)).cast("int").alias("__b"),
        )
        .filter(F.col("__w") > 0)
        .persist()
    )
    totals = rows.groupBy("__b").agg(F.sum("__w").alias("__n"))
    w_off = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    # grand total rides on the (metadata-sized) offsets frame; NOTE the
    # name must differ from `__w` under Spark's CASE-INSENSITIVE
    # resolution — `__W` here makes every later `__w` reference
    # ambiguous
    grand = totals.agg(F.sum("__n").alias("__tot"))
    offsets = offsets.crossJoin(F.broadcast(grand))
    w_in = (
        Window.partitionBy("__b")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        rows.withColumn("__cumin", F.coalesce(F.sum("__w").over(w_in), F.lit(0)))
        .join(F.broadcast(offsets), "__b")
        .withColumn("__s", F.col("__off") + F.col("__cumin"))
    )
    # points sit at ceil(j*W/k) boundaries; row selected iff a point
    # falls in [s, s+w): ceil((s+w)k/W) > ceil(s*k/W), all-integer
    pts_before = F.expr(f"(__s * {int(k)} + __tot - 1) div __tot")
    pts_through = F.expr(f"((__s + __w) * {int(k)} + __tot - 1) div __tot")
    return staged.filter(pts_through > pts_before).select(
        id_col,
        F.col("__w").alias("weight"),
        F.col("__s").cast("long").alias("cum_before"),
    )


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split-v1",
    method: str = "md5",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """:func:`hash_split` with the near-duplicate CLUSTER as the split
    unit: every member of a connected near-dup component lands on the
    SAME side, so a test doc can never have a near-copy in train —
    the leakage a doc-level split silently permits (near-dups are
    precisely the rows most likely to exist; arXiv v1/v2, mirrored
    pages, boilerplate variants).

    Composition: connected components over the pair list →
    (doc, cluster) mapping (docs in no pair are their own cluster) →
    the standard content-hash split keyed on ``cluster_id``. Adds the
    clustering's label-propagation rounds; the split itself stays a
    zero-shuffle projection. Returns docs + ``cluster_id`` + ``split``.
    """
    from htm_streamer_spark.operators.clustering import dedup_clusters

    cc = dedup_clusters(docs.select(F.col(id_col).alias("doc_id")), pairs, src, dst)
    mapped = docs.join(
        cc.select(F.col("doc_id").alias(id_col), "cluster_id"), id_col
    )
    return hash_split(mapped, weights, id_col="cluster_id", salt=salt, method=method)


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Optimal (Neyman 1934) sample-size allocation across strata for a
    fixed audit budget: (stratum, n_rows, sd, alloc_share, n_alloc).

    A validator that can afford to deep-check ``total_n`` rows should
    NOT spread them uniformly or proportionally: the variance-minimizing
    allocation for estimating the population mean is
    ``n_h ∝ N_h·σ_h`` — big AND noisy strata get the budget, a huge but
    constant stratum gets almost none. This turns the per-stratum stats
    the engine already computes into the audit SAMPLING PLAN the budget
    should follow (feed the resulting fractions to
    ``stratified_sample``).

    Integerization uses the largest-remainder method so ``Σ n_alloc ==
    total_n`` exactly and deterministically (remainder ties break by
    stratum name); zero-variance or single-row strata get weight 0 — if
    EVERY stratum is zero-variance the allocation is NULL (no variance
    to minimize; any sample is equally informative).

    One combinable power-sum groupBy over the fact table; the
    allocation arithmetic and the remainder ranking run on the
    |strata|-sized frame.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    agg = df.groupBy(stratum_col).agg(
        F.count(v).cast("double").alias("n"),
        F.sum(v).alias("s"),
        F.sum(v * v).alias("ss"),
    )
    # sample sd (n-1 denominator): the survey-sampling convention
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - 1)
    sd = F.when(F.col("n") > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(
        F.lit(0.0)
    )
    w_all = Window.partitionBy()
    scored = agg.withColumn("_w", F.col("n") * sd).withColumn(
        "_tw", F.sum("_w").over(w_all)
    )
    share = F.when(F.col("_tw") > 0, F.col("_w") / F.col("_tw"))
    exact = share * F.lit(float(total_n))
    scored = scored.withColumn("_share", share).withColumn(
        "_floor", F.floor(exact)
    ).withColumn("_rem", exact - F.floor(exact))
    # largest remainder: hand the leftover units to the biggest
    # fractional parts (deterministic tie-break by stratum name)
    w_rem = Window.orderBy(F.desc("_rem"), F.col(stratum_col))
    scored = scored.withColumn("_rank", F.row_number().over(w_rem)).withColumn(
        "_left", F.lit(int(total_n)) - F.sum("_floor").over(w_all)
    )
    n_alloc = F.when(
        F.col("_share").isNotNull(),
        F.col("_floor") + (F.col("_rank") <= F.col("_left")).cast("long"),
    )
    return scored.select(
        stratum_col,
        F.col("n").cast("long").alias("n_rows"),
        F.round(sd + F.lit(1e-9), 6).alias("sd"),
        F.round(F.col("_share") + F.lit(1e-9), 6).alias("alloc_share"),
        n_alloc.cast("long").alias("n_alloc"),
    )
