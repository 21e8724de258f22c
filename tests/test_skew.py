"""Skew handling: the salted uniqueness aggregation must return exact
counts when one key carries 50% of all rows (the north rule's hot-key
scenario; FIXTURES.md dup_doc_id skew fixture at larger scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig
from htm_streamer_spark.operators.uniqueness import duplicate_ids, duplicate_violations


def test_hot_key_exact_counts(spark):
    n, hot = 400_000, 200_000
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("doc-hot"))
        .otherwise(F.concat(F.lit("doc-"), F.col("id")))
        .alias("doc_id"),
        (F.col("id") % 64).cast("int").alias("part_id"),
    )
    # plant one small duplicate group besides the hot key
    extra = spark.range(3).select(
        F.lit("doc-pair").alias("doc_id"), F.lit(0).cast("int").alias("part_id")
    )
    df = df.unionByName(extra)
    dups = {r["doc_id"]: r["dup_cnt"] for r in duplicate_ids(df, EngineConfig()).collect()}
    assert dups == {"doc-hot": hot, "doc-pair": 3}


def test_hot_key_violation_rows_complete(spark):
    n, hot = 100_000, 50_000
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("doc-hot"))
        .otherwise(F.concat(F.lit("doc-"), F.col("id")))
        .alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("part_id"),
    )
    v = duplicate_violations(df, EngineConfig())
    assert v.count() == hot  # every copy of the hot key flagged
    assert v.select("doc_id").distinct().count() == 1
