"""Snapshot diff: the incremental-ingestion delta between two corpus
snapshots — which keys were added, removed, or changed in place.

Every recurring pipeline (crawl refresh, dump re-import, nightly
re-export) starts with this question; downstream stages (re-embed,
re-dedup, re-validate) should touch only the delta, never the full
corpus.

Scale notes (100 TB):
- The comparison is content-HASH based: both sides reduce to a narrow
  (key, md5) frame inside their scans, so the full-outer join shuffles
  ~48 bytes/row, not document text. At real scale, write both
  snapshots bucketed by the key (sources/table_io pins bucket layout)
  and the join is co-located — zero shuffle.
- Full outer join on a unique key is 1-to-1: no skew surface; AQE
  coalesces the tiny unmatched tails.
- ``unchanged`` rows — the overwhelming majority of a refresh — are
  dropped inside the joined filter, before anything downstream
  materializes.

Reference analog: none (the reference re-validates whole tables);
this is the Spark-first incremental shape its batch loop lacks.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key_col: str = "doc_id",
    content_cols: Sequence[str] = ("text",),
) -> DataFrame:
    """(key, change, old_hash, new_hash) for every key that differs
    between ``old`` and ``new``; change ∈ {'added','removed','changed'}.

    Content identity is md5 over the ``content_cols`` concatenated with
    an ASCII unit separator (\\x1f) — unambiguous for values that
    themselves contain separators. Null content columns hash as the
    empty string (concat_ws semantics), so null→'' transitions are NOT
    flagged; pass an explicit sentinel column if that distinction
    matters. Keys are assumed unique per snapshot (enforce upstream
    with the uniqueness operator).
    """
    sep = "\x1f"

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("key"),
            F.md5(F.concat_ws(sep, *[F.col(c) for c in content_cols])).alias(alias),
        )

    o = hashed(old, "old_hash")
    n = hashed(new, "new_hash")
    joined = o.join(n, "key", "full_outer")
    change = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .otherwise(F.lit("changed"))
    )
    return (
        joined.filter(
            F.col("old_hash").isNull()
            | F.col("new_hash").isNull()
            | (F.col("old_hash") != F.col("new_hash"))
        )
        .select("key", change.alias("change"), "old_hash", "new_hash")
    )
