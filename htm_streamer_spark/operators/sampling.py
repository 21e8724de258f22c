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
