"""Bucketed table layout: pre-shuffled, pre-sorted storage so repeated
per-key work — joins, the doc_id uniqueness check, grouped scoring —
runs with ZERO exchanges.

Why this matters at 100 TB: the validation suite's dominant shuffle is
`groupBy(doc_id)` for the uniqueness check, and every labels/outputs
attach is a join on the same key. A table written with
``bucketBy(N, key)`` is ALREADY hash-partitioned on disk: Spark's scan
exposes the bucketing as the output partitioning, Catalyst drops the
Exchange on both the aggregation and any join against a table bucketed
the same way (same key, same N — or a divisor, with
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``). The shuffle is
paid ONCE at ingest instead of on every one of the daily validation /
attach / dedup runs over the same corpus.

Sizing rule of thumb at scale: pick N so each bucket's compressed
parquet lands near the split target (e.g. 10^12 rows × ~1 KB ≈ 1 PB
raw → N in the tens of thousands; at the 100 TB hint, N ≈ 4-8k keeps
buckets in the 10-25 GB range, one task each on a 1000-executor
cluster). N is a layout-time constant — changing it rewrites the
table, so err on the high side; empty buckets cost a file handle, not
a task.

Reference analog: the reference has no storage layout at all (it
re-reads CSV per run, /root/reference/htm_streamer/utils/fs.py); this
is the Spark-native answer to "the same key is grouped on every run".

Bucketed tables live in the session catalog (parquet files + bucketing
metadata in the table definition — the metastore is what records the
layout; a bare ``spark.read.parquet`` of the same files would NOT see
it). ``path`` pins the data location; the catalog entry is the handle.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed by ``keys`` into
    ``n_buckets`` files per write-task group, optionally sorted within
    each bucket (``sort_cols`` starting with the bucket key lets a
    downstream merge join skip its Sort node too when each bucket is a
    single file)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, keys[0], *keys[1:])
    if sort_cols:
        w = w.sortBy(sort_cols[0], *sort_cols[1:])
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    keys. With both sides bucketed (same keys, same N) the physical
    plan contains NO Exchange — asserted in tests via
    :func:`count_exchanges`."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)


def bucketed_duplicate_ids(
    spark: SparkSession, table: str, key: str = "doc_id"
) -> DataFrame:
    """The uniqueness check over a bucketed source: (key, dup_cnt) for
    keys appearing more than once — shuffle-FREE, because the scan's
    bucketing already satisfies the aggregation's required distribution.
    (The salted two-phase variant in operators/uniqueness.py is for
    un-bucketed inputs; on a bucketed table hot keys are pre-spread at
    most one bucket wide and the plain plan is both simpler and
    exchange-free.)"""
    from pyspark.sql import functions as F

    return (
        spark.table(table)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("dup_cnt"))
        .filter(F.col("dup_cnt") > 1)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the formatted physical
    plan — 0 proves bucketing satisfied every required distribution."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return len(re.findall(r"^\(\d+\) Exchange\b", buf.getvalue(), re.M))
