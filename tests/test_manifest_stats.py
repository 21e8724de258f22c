"""Manifest column stats + file skipping (sources/table_io.py
stage_spark(stats_cols=...) / read_pruned): Iceberg-style pruning on
footer min/max, with soundness (never lose rows) as the property."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.sources.table_io import ManifestCatalog


def _stage_ranges(spark, cat, ranges):
    # one commit per disjoint doc_id range -> one file per range
    for lo, hi in ranges:
        df = spark.range(lo, hi).select(
            F.col("id").alias("doc_id"), (F.col("id") * 2).alias("payload")
        ).coalesce(1)
        cat.stage_spark("seq", df, stats_cols=("doc_id",))
        cat.commit()


def test_range_read_skips_files(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    _stage_ranges(spark, cat, [(0, 100), (100, 200), (200, 300), (300, 400)])
    df, rep = cat.read_pruned(spark, "seq", "doc_id", lo=120, hi=180)
    assert rep == {"files_total": 4, "files_read": 1, "files_skipped": 3}
    got = sorted(r["doc_id"] for r in df.collect())
    assert got == list(range(120, 181))


def test_pruning_is_sound_across_boundaries(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    _stage_ranges(spark, cat, [(0, 50), (50, 120), (120, 260)])
    full = cat.read(spark, "seq")
    for lo, hi in [(0, 0), (49, 50), (119, 121), (200, 500), (-10, 1000)]:
        df, rep = cat.read_pruned(spark, "seq", "doc_id", lo=lo, hi=hi)
        want = sorted(
            r["doc_id"]
            for r in full.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            ).collect()
        )
        got = sorted(r["doc_id"] for r in df.collect()) if df is not None else []
        assert got == want, (lo, hi, rep)


def test_no_overlap_returns_none_with_full_skip(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    _stage_ranges(spark, cat, [(0, 10), (10, 20)])
    df, rep = cat.read_pruned(spark, "seq", "doc_id", lo=1000, hi=2000)
    assert df is None
    assert rep["files_skipped"] == rep["files_total"] == 2


def test_statless_files_never_pruned(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    df = spark.range(0, 10).select(F.col("id").alias("doc_id")).coalesce(1)
    cat.stage_spark("seq", df)  # no stats_cols
    cat.commit()
    out, rep = cat.read_pruned(spark, "seq", "doc_id", lo=500, hi=600)
    # conservatively read (no stats -> can't skip), residual filter empties it
    assert rep["files_read"] == 1
    assert out.count() == 0


def test_stats_survive_manifest_reload(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    _stage_ranges(spark, cat, [(0, 100), (100, 200)])
    reloaded = ManifestCatalog(tmp_path / "cat")  # fresh object, same JSON
    df, rep = reloaded.read_pruned(spark, "seq", "doc_id", lo=150, hi=160)
    assert rep["files_skipped"] == 1
    assert df.count() == 11
