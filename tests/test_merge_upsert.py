"""Copy-on-write MERGE (merge_upsert): latest-wins semantics, update
tie-break, bucket-level file pruning (untouched buckets carried by
reference), untagged-initial-load safety, layout pinning, and abort
atomicity."""

from __future__ import annotations

import pytest

from htm_streamer_spark.sources.table_io import ManifestCatalog, merge_upsert

SCHEMA = "k long, v string, updated_at long"


def _rows(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _state(spark, cat):
    df = cat.read(spark, "t", latest_only=True)
    return {r.k: (r.v, r.updated_at) for r in df.collect()}


def test_insert_update_latest_wins(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(spark, cat, "t", _rows(spark, [(1, "a", 10), (2, "b", 10)]), ["k"], "updated_at")
    # newer update wins; stale update (older ts) loses; new key inserts
    merge_upsert(
        spark, cat, "t",
        _rows(spark, [(1, "a2", 20), (2, "stale", 5), (3, "c", 1)]),
        ["k"], "updated_at",
    )
    assert _state(spark, cat) == {1: ("a2", 20), 2: ("b", 10), 3: ("c", 1)}


def test_exact_tie_prefers_update(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(spark, cat, "t", _rows(spark, [(1, "old", 10)]), ["k"], "updated_at")
    merge_upsert(spark, cat, "t", _rows(spark, [(1, "new", 10)]), ["k"], "updated_at")
    assert _state(spark, cat) == {1: ("new", 10)}


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    # seed many keys across buckets
    merge_upsert(
        spark, cat, "t",
        _rows(spark, [(k, f"v{k}", 1) for k in range(64)]),
        ["k"], "updated_at", n_buckets=8,
    )
    before = {e["file"]: e["bucket"] for e in cat.entries("t", latest_only=True)}
    # single-key update: only that key's bucket may be rewritten
    merge_upsert(spark, cat, "t", _rows(spark, [(0, "V0", 2)]), ["k"], "updated_at", n_buckets=8)
    after = {e["file"]: e["bucket"] for e in cat.entries("t", latest_only=True)}
    from pyspark.sql import functions as F

    tb = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(0).cast("long")), F.lit(8)).cast("int").alias("b")
    ).collect()[0].b
    carried = {f for f in after if f in before}
    assert carried, "expected untouched bucket files carried by reference"
    assert all(before[f] != tb for f in carried)
    # every untouched bucket's file set is identical
    for f, b in before.items():
        if b != tb:
            assert f in after and after[f] == b
    assert _state(spark, cat)[0] == ("V0", 2)


def test_untagged_initial_load_is_fully_merged(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    cat.stage_spark("t", _rows(spark, [(k, f"v{k}", 1) for k in range(20)]))  # no bucket tags
    cat.commit()
    merge_upsert(spark, cat, "t", _rows(spark, [(0, "V0", 2)]), ["k"], "updated_at", n_buckets=4)
    got = _state(spark, cat)
    assert got[0] == ("V0", 2)
    assert len(got) == 20 and got[7] == ("v7", 1)  # nothing lost, no dupes
    assert all("bucket" in e for e in cat.entries("t", latest_only=True))


def test_n_buckets_layout_pinned(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(spark, cat, "t", _rows(spark, [(1, "a", 1)]), ["k"], "updated_at", n_buckets=8)
    with pytest.raises(ValueError, match="n_buckets"):
        merge_upsert(spark, cat, "t", _rows(spark, [(2, "b", 1)]), ["k"], "updated_at", n_buckets=16)


def test_failed_merge_aborts_cleanly(spark, tmp_path, monkeypatch):
    cat = ManifestCatalog(tmp_path / "cat")
    merge_upsert(spark, cat, "t", _rows(spark, [(1, "a", 1)]), ["k"], "updated_at")
    v = cat.version()
    before = _state(spark, cat)

    def boom(*a, **kw):
        raise RuntimeError("injected")

    monkeypatch.setattr(cat, "restage", boom)
    with pytest.raises(RuntimeError, match="injected"):
        merge_upsert(spark, cat, "t", _rows(spark, [(1, "x", 9)]), ["k"], "updated_at")
    assert cat.version() == v and cat._staged == []
    assert _state(spark, cat) == before
