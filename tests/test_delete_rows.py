"""Copy-on-write DELETE (delete_rows): row removal, bucket-level
pruning, layout pinning, and the delete+expire physical-erasure flow
(right-to-be-forgotten)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.sources.table_io import (
    ManifestCatalog,
    delete_rows,
    merge_upsert,
)

SCHEMA = "k long, v string, updated_at long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _keys(spark, cat):
    return {r.k for r in cat.read(spark, "t", latest_only=True).collect()}


def _del(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "k long")


def test_delete_removes_only_listed_keys(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(
        spark, cat, "t", _rows(spark, [(k, f"v{k}", 1) for k in range(10)]),
        ["k"], "updated_at",
    )
    delete_rows(spark, cat, "t", _del(spark, [3, 7]), ["k"])
    assert _keys(spark, cat) == set(range(10)) - {3, 7}


def test_delete_missing_key_is_noop_on_data(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(
        spark, cat, "t", _rows(spark, [(1, "a", 1), (2, "b", 1)]),
        ["k"], "updated_at",
    )
    delete_rows(spark, cat, "t", _del(spark, [99]), ["k"])
    assert _keys(spark, cat) == {1, 2}


def test_delete_prunes_untouched_buckets(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(
        spark, cat, "t", _rows(spark, [(k, f"v{k}", 1) for k in range(64)]),
        ["k"], "updated_at", n_buckets=8,
    )
    before = {e["file"] for e in cat.entries("t", latest_only=True)}
    delete_rows(spark, cat, "t", _del(spark, [0]), ["k"], n_buckets=8)
    after = {e["file"] for e in cat.entries("t", latest_only=True)}
    tb = (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(0).cast("long")), F.lit(8))
            .cast("int")
            .alias("b")
        )
        .collect()[0]
        .b
    )
    # every bucket except key 0's is carried by reference (same file)
    carried = after & before
    buckets_after = {e["file"]: e["bucket"] for e in cat.entries("t", latest_only=True)}
    assert all(buckets_after[f] != tb for f in carried - {None})
    assert len(carried) >= 1
    assert _keys(spark, cat) == set(range(1, 64))


def test_delete_respects_layout_pin(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(
        spark, cat, "t", _rows(spark, [(1, "a", 1)]), ["k"], "updated_at",
        n_buckets=8,
    )
    with pytest.raises(ValueError, match="n_buckets"):
        delete_rows(spark, cat, "t", _del(spark, [1]), ["k"], n_buckets=4)


def test_time_travel_still_sees_rows_until_expired(spark, tmp_path):
    """The GDPR flow: delete creates a new snapshot (old version still
    readable), expire_versions then physically removes the superseded
    files so the deleted rows are unreadable at ANY version."""
    cat = ManifestCatalog(tmp_path / "cat")
    v1 = merge_upsert(
        spark, cat, "t", _rows(spark, [(1, "secret", 1), (2, "keep", 1)]),
        ["k"], "updated_at",
    )
    delete_rows(spark, cat, "t", _del(spark, [1]), ["k"])
    # pre-delete snapshot still holds the row (delete is logical)
    old = {r.k for r in cat.read(spark, "t", as_of=v1).collect()}
    assert 1 in old
    removed = cat.expire_versions(keep_last=1)
    assert removed, "expiry should delete superseded files"
    # the current snapshot no longer has the key...
    assert _keys(spark, cat) == {2}
    # ...and no file on disk under the catalog contains it anymore
    import glob

    files = glob.glob(str(cat.root / "**" / "*.parquet"), recursive=True)
    live = spark.read.parquet(*files) if files else None
    assert live is not None and live.where(F.col("k") == 1).count() == 0


def test_delete_requires_keys(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    with pytest.raises(ValueError):
        delete_rows(spark, cat, "t", _del(spark, [1]), [])
