"""Bucketed layout: the join and the uniqueness aggregation over
identically-bucketed tables must run with ZERO exchanges (the shuffle
is paid once at ingest), and results must equal the plain-shuffle
answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.sources.bucketed import (
    bucketed_duplicate_ids,
    colocated_join,
    count_exchanges,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.range(2_000).select(
        F.concat(F.lit("doc-"), (F.col("id") % 1_500)).alias("doc_id"),
        (F.col("id") % 7).alias("part_id"),
        F.col("id").alias("payload"),
    )
    labels = spark.range(1_500).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 3 == 0).alias("flagged"),
    )
    write_bucketed(
        docs, "b_docs", ["doc_id"], n_buckets=8,
        sort_cols=["doc_id"], path=str(base / "docs"),
    )
    write_bucketed(
        labels, "b_labels", ["doc_id"], n_buckets=8,
        sort_cols=["doc_id"], path=str(base / "labels"),
    )
    yield "b_docs", "b_labels"
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_labels")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    docs_t, labels_t = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = colocated_join(spark, docs_t, labels_t, ["doc_id"])
        assert count_exchanges(joined) == 0
        # and the answer equals the plain-shuffle join
        want = (
            spark.table(docs_t)
            .join(spark.table(labels_t).hint("shuffle_hash"), "doc_id")
            .count()
        )
        assert joined.count() == want == 2_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_uniqueness_has_no_exchange(spark, bucketed_tables):
    docs_t, _ = bucketed_tables
    dups = bucketed_duplicate_ids(spark, docs_t)
    assert count_exchanges(dups) == 0
    got = {r.doc_id: r.dup_cnt for r in dups.collect()}
    # ids 0..499 appear twice (2000 rows mod 1500 distinct ids)
    assert len(got) == 500
    assert all(v == 2 for v in got.values())


def test_unbucketed_baseline_does_shuffle(spark, bucketed_tables):
    """Control: the same aggregation over the raw (un-bucketed) parquet
    files DOES need an exchange — proving the zero above comes from the
    bucketing metadata, not from some session-wide accident."""
    docs_t, _ = bucketed_tables
    raw = spark.table(docs_t).inputFiles()
    plain = spark.read.parquet(*raw).groupBy("doc_id").count().filter("count > 1")
    assert count_exchanges(plain) >= 1
