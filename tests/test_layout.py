"""Partition-pruning evidence for the Hive-style directory layout."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.sources.layout import (
    pruned_file_count,
    read_partitioned,
    write_partitioned,
)


def _docs(spark, n_sources=4, docs_per_source=20):
    rows = [
        (s * 1000 + i, f"text {s} {i}", f"src{s}")
        for s in range(n_sources)
        for i in range(docs_per_source)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_partition_filter_prunes_files(spark, tmp_path):
    path = str(tmp_path / "part_docs")
    write_partitioned(_docs(spark), path, ["source"])
    full = read_partitioned(spark, path)
    one = full.where(F.col("source") == "src2")
    n_full = pruned_file_count(full)
    n_one = pruned_file_count(one)
    # 4 partition dirs -> the filtered scan lists only src2's files
    assert n_full >= 4
    assert 0 < n_one <= n_full // 4
    # and the planner records it as a partition filter, not a data filter
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src2" in plan


def test_partition_values_roundtrip(spark, tmp_path):
    path = str(tmp_path / "part_docs_rt")
    df = _docs(spark, n_sources=3, docs_per_source=5)
    write_partitioned(df, path, ["source"], sort_col="doc_id")
    back = read_partitioned(spark, path)
    assert back.count() == 15
    got = {
        (r["doc_id"], r["source"])
        for r in back.select("doc_id", "source").collect()
    }
    want = {(r["doc_id"], r["source"]) for r in df.collect()}
    assert got == want


def test_non_partition_filter_does_not_prune(spark, tmp_path):
    path = str(tmp_path / "part_docs_np")
    write_partitioned(_docs(spark), path, ["source"])
    full = read_partitioned(spark, path)
    by_id = full.where(F.col("doc_id") == 2003)
    # a data-column predicate cannot prune directories; it pushes down
    # to parquet instead
    assert pruned_file_count(by_id) == pruned_file_count(full)
    plan = by_id._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan


def test_write_partitioned_rejects_empty_cols(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        write_partitioned(_docs(spark), str(tmp_path / "x"), [])
