"""Incremental MinHash dedup (operators/dedup.py minhash_band_index +
incremental_near_duplicates): the increment-vs-persisted-index shape a
crawl-ingest pipeline runs instead of re-deduping the corpus. Pinned
invariant: incremental == the full batch recompute restricted to pairs
touching the increment."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.operators.dedup import (
    incremental_near_duplicates,
    minhash_band_index,
    minhash_near_duplicates,
)

T = 0.5  # the corpus's meaningful near-dup band (same as minhash_pairs_docs)


def _is_new():
    # deterministic content-hash split, ~20% of docs
    return (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 5
        == 0
    )


def test_incremental_equals_batch_restricted_to_new(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    new = docs.filter(_is_new())
    old = docs.filter(~_is_new())
    new_ids = {r.doc_id for r in new.select("doc_id").collect()}
    assert new_ids and old.count() > 0

    full = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in minhash_near_duplicates(
            docs, jaccard_threshold=T, method="md5"
        ).collect()
    }
    expected = {
        k: v for k, v in full.items() if k[0] in new_ids or k[1] in new_ids
    }
    assert expected, "increment should touch some near-dup pairs"
    assert len(expected) < len(full), "some pairs must be old-old only"

    idx = minhash_band_index(old, jaccard_threshold=T, method="md5")
    got = {
        (r.doc_a, r.doc_b): round(r.jaccard, 6)
        for r in incremental_near_duplicates(
            new, idx, docs, jaccard_threshold=T, method="md5"
        ).collect()
    }
    assert got == expected


def test_index_extension_is_a_union(spark):
    """index(old) ∪ index(new) == index(old ∪ new) row-for-row — the
    property that makes the persisted index appendable per ingest."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    new, old = docs.filter(_is_new()), docs.filter(~_is_new())
    whole = minhash_band_index(docs, jaccard_threshold=T, method="md5")
    stitched = minhash_band_index(old, jaccard_threshold=T, method="md5").unionByName(
        minhash_band_index(new, jaccard_threshold=T, method="md5")
    )
    sym_diff = whole.exceptAll(stitched).count() + stitched.exceptAll(whole).count()
    assert sym_diff == 0


def test_empty_increment_returns_empty(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    empty = docs.filter(F.lit(False))
    idx = minhash_band_index(docs, jaccard_threshold=T, method="md5")
    out = incremental_near_duplicates(empty, idx, docs, jaccard_threshold=T, method="md5")
    assert out.count() == 0
    assert set(out.columns) == {"doc_a", "doc_b", "jaccard"}
