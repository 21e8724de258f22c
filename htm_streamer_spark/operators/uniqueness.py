"""doc_id uniqueness via salted two-phase hash aggregation.

Reference analog: duplicate dataset name → hard ``NameError``
(/root/reference/driver.py:46-48). At 10^12 rows a hot duplicate key (the
skew fixture: one id repeated 10^4+ times in a partition) would melt the
single reducer that owns ``hash(doc_id)``. The north rule requires the
salted pattern explicitly:

- phase 1: group by ``(doc_id, salt)`` where the salt sub-splits identical
  keys (derived from the row's physical position, so copies of the hot key
  spread over ``n_salts`` reducers); partial counts.
- phase 2: group by ``doc_id`` over the per-salt partial counts — the hot
  key now contributes at most ``n_salts`` rows to the final shuffle.

Spark's map-side partial aggregation already combines within an input
split; the salt additionally bounds the reduce-side row count per key
between the two phases, and AQE's skew handling covers the join-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig


def duplicate_ids(df: DataFrame, cfg: EngineConfig, key_col: str = "doc_id") -> DataFrame:
    """DataFrame of (key_col, dup_cnt) for every key with count > 1."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(cfg.n_salts))
    partial = (
        df.select(key_col, salt.alias("_salt"))
        .groupBy(key_col, "_salt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    return (
        partial.groupBy(key_col)
        .agg(F.sum("_cnt").alias("dup_cnt"))
        .filter(F.col("dup_cnt") > 1)
    )


def duplicate_content_violations(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows for DUPLICATE CONTENT: rows whose token array is
    carried by ≥2 DISTINCT doc_ids — the training-data trap
    ``dup_doc_id`` cannot see (same sequence re-ingested under fresh
    ids inflates that content's sampling weight silently; an epoch over
    such data trains on the duplicate k times).

    Scale shape: content key = ``xxhash64(tokens, n_tok)`` (JVM-hashed,
    64-bit — the array never shuffles, only its hash). Phase 1 groups
    by (hash, doc_id) — map-side combinable, and a hot content value
    replicated under 10^9 different ids spreads across reducers by
    doc_id. Phase 2 counts distinct ids per hash map-side-combinably
    (the phase-1 output IS the distinct (hash, doc_id) set), so no
    per-hash row list ever materializes. Join-back is left to AQE for
    the same reasons as ``duplicate_violations``. A 64-bit hash
    collision would flag a false pair at ~N^2/2^64 probability — at
    validation stakes (a violation row, not a deletion) that is the
    right trade; a paranoid caller can re-verify flagged groups
    exactly, which touches only flagged rows.

    Output: (doc_id, part_id, check_id, payload) with the content hash
    in the payload so downstream can group the copies.
    """
    h = F.xxhash64(F.col("tokens"), F.col("n_tok")).alias("_ch")
    per_doc = (
        df.where(F.col("tokens").isNotNull())
        .select("doc_id", h)
        .groupBy("_ch", "doc_id")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    dup_hashes = (
        per_doc.groupBy("_ch")
        .agg(F.count(F.lit(1)).alias("n_ids"))
        .filter(F.col("n_ids") > 1)
        .select("_ch")
    )
    return (
        # Same tokens.isNotNull() filter as phase 1: Spark hash functions
        # skip NULL inputs, so xxhash64(NULL, n_tok) == xxhash64([], n_tok)
        # and an unfiltered join-back would falsely flag NULL-tokens rows
        # whenever >=2 docs share an empty token array with the same n_tok.
        df.where(F.col("tokens").isNotNull())
        .select("doc_id", "part_id", F.xxhash64(F.col("tokens"), F.col("n_tok")).alias("_ch"))
        .join(dup_hashes, "_ch", "left_semi")
        .select(
            "doc_id",
            "part_id",
            F.lit("dup_content").alias("check_id"),
            F.col("_ch").alias("_content_hash"),
        )
        .withColumn(
            "payload",
            F.to_json(
                F.struct(
                    F.lit("dup_content").alias("check_id"),
                    F.col("doc_id"),
                    F.col("part_id"),
                    F.col("_content_hash").alias("content_hash"),
                )
            ),
        )
        .drop("_content_hash")
    )


def duplicate_violations(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Violation rows: every row whose doc_id is duplicated.

    The join-back strategy is left to AQE: the duplicated-id set is
    usually small (~2% violation rate) and AQE picks a broadcast join at
    runtime from the ACTUAL size — but 2% of 10^12 rows is 2×10^10 ids,
    so a forced broadcast hint would OOM the driver at scale. AQE's
    skew-join handling also covers a hot duplicated key here.
    Output: (doc_id, part_id, check_id, payload).
    """
    dups = duplicate_ids(df, cfg).select("doc_id")
    return (
        df.join(dups, "doc_id", "left_semi")
        .select(
            "doc_id",
            "part_id",
            F.lit("dup_doc_id").alias("check_id"),
        )
        .withColumn(
            "payload",
            F.to_json(F.struct(F.col("check_id"), F.col("doc_id"), F.col("part_id"))),
        )
    )
