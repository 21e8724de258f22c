"""Hive-style directory-partitioned layout: partition pruning so a
filtered scan never opens the files of non-matching partitions.

This is the OTHER half of the storage-layout story next to
``bucketed.py``: bucketing pre-pays the shuffle for per-KEY work
(joins, grouped aggregation); directory partitioning pre-pays the
FILTER for per-SEGMENT work (one source, one day, one language). A
table written ``partitionBy("source")`` stores each source under its
own ``source=.../`` directory; a query filtering on source is planned
with a ``PartitionFilters`` entry and lists only the matching
directories — at 100 TB and 1000 partitions, a one-partition query
touches 0.1% of the files BEFORE any I/O, no row-level filtering
involved.

Choosing the partition column at scale: low-cardinality, coarse,
query-aligned (source / ingest date / language). High-cardinality
columns (doc_id!) produce millions of tiny directories and kill the
driver's file listing — that's what bucketing is for. The two compose:
``partitionBy(date).bucketBy(N, doc_id)``.

Pairs with sorted-within-file layout (``sortWithinPartitions`` before
the write) so parquet row-group min/max statistics additionally skip
pages within the surviving files for range predicates on the sort
column.

Reference analog: none — the reference re-reads its whole CSV input
per run (/root/reference/htm_streamer/utils/fs.py); layout-level
pruning is the Spark-native answer to "don't read what the query
can't match".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    *,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a Hive-partitioned parquet tree under ``path``.

    ``sort_col`` additionally sorts rows within each task's output
    file so parquet min/max row-group stats are tight for range
    predicates on that column.
    """
    if not partition_cols:
        raise ValueError("partition_cols must be non-empty")
    out = df
    if sort_col is not None:
        out = out.repartition(*[out[c] for c in partition_cols]).sortWithinPartitions(
            sort_col
        )
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a Hive-partitioned tree; partition columns come back as
    real columns (their values live in directory names, not data
    files), and filters on them prune at planning time."""
    return spark.read.parquet(path)


def pruned_file_count(df: DataFrame) -> int:
    """Number of data files the frame's scan actually read, from the
    engine's own ``numFiles`` scan metric — the direct evidence of
    partition pruning. (``DataFrame.inputFiles()`` is NOT usable here:
    it reports the relation's full listing, ignoring partition
    filters.)

    Executes the plan once on this QueryExecution instance to populate
    the metric — intended for tests/diagnostics, not hot paths.
    """
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    leaves = qe.executedPlan().collectLeaves()
    total = 0
    for i in range(leaves.length()):
        metrics = leaves.apply(i).metrics()
        if metrics.contains("numFiles"):
            total += int(metrics.apply("numFiles").value())
    return total
