"""Orphan-file GC (VACUUM analog): removes crashed/aborted stage
debris, never touches referenced or staged or too-young files."""

from __future__ import annotations

from htm_streamer_spark.sources.table_io import ManifestCatalog


def _cat_with_commit(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    cat.stage_spark("t", spark.createDataFrame([(1, "a")], "k long, v string"))
    cat.commit()
    return cat


def test_gc_removes_aborted_stage_files(spark, tmp_path):
    cat = _cat_with_commit(spark, tmp_path)
    cat.stage_spark("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    cat.abort()  # forgets the staged list; files remain on disk
    orphans_before = [
        p
        for p in (cat.root / "data").rglob("*.parquet")
        if str(p.relative_to(cat.root))
        not in {e["file"] for e in cat.entries("t")}
    ]
    assert orphans_before, "abort should have left debris for this test"
    deleted = cat.gc_orphans()
    assert len(deleted) == len(orphans_before)
    # committed data intact
    assert [r.k for r in cat.read(spark, "t", latest_only=True).collect()] == [1]


def test_gc_spares_staged_but_uncommitted_files(spark, tmp_path):
    cat = _cat_with_commit(spark, tmp_path)
    cat.stage_spark("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    assert cat.gc_orphans() == []  # staged files are protected
    cat.commit()
    assert sorted(r.k for r in cat.read(spark, "t", latest_only=True).collect()) == [2]


def test_gc_grace_period_spares_young_files(spark, tmp_path):
    cat = _cat_with_commit(spark, tmp_path)
    cat.stage_spark("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    cat.abort()
    assert cat.gc_orphans(older_than_seconds=3600) == []
    assert cat.gc_orphans() != []


def test_gc_noop_on_clean_catalog(spark, tmp_path):
    cat = _cat_with_commit(spark, tmp_path)
    assert cat.gc_orphans() == []
    # expire_versions already unlinks superseded files; gc stays a no-op
    cat.stage_spark("t", spark.createDataFrame([(2, "b")], "k long, v string"))
    cat.commit()
    cat.expire_versions(keep_last=1)
    assert cat.gc_orphans() == []
