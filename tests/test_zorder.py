"""Z-order clustering (sources/zorder.py): Morton-key correctness and
footer-level pruning evidence vs a 1-D sorted layout."""

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.sources.zorder import (
    prune_stats,
    write_zordered,
    zorder_key,
)


def _grid(spark, n=64):
    """Uniform n x n grid of (x, y) points."""
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).cast("double").alias("x"),
            (F.col("id") / n).cast("long").cast("double").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_zorder_key_interleaves_known_bits(spark):
    # x=0b11, y=0b01 with 2 bits -> z = y1 x1 y0 x0 = 0 1 1 1 = 7
    df = spark.createDataFrame([(3.0, 1.0)], "x double, y double")
    z = zorder_key(
        [F.col("x"), F.col("y")], [(0.0, 4.0), (0.0, 4.0)], bits=2
    )
    assert df.select(z.alias("z")).collect()[0]["z"] == 7


def test_zorder_key_locality_beats_linear_on_y(spark):
    # points close in (x, y) should be close in z even when far apart
    # in a pure-x ordering
    df = spark.createDataFrame(
        [(1.0, 1.0), (1.0, 2.0), (63.0, 1.0)], "x double, y double"
    )
    z = zorder_key(
        [F.col("x"), F.col("y")], [(0.0, 64.0), (0.0, 64.0)], bits=6
    )
    a, b, c = [r["z"] for r in df.select(z.alias("z")).collect()]
    assert abs(a - b) < abs(a - c)


def test_zorder_rejects_bit_overflow(spark):
    with pytest.raises(ValueError):
        zorder_key([F.col("x")] * 4, [(0.0, 1.0)] * 4, bits=16)


def test_box_query_prunes_both_dims_linear_only_one(spark, tmp_path):
    df = _grid(spark, 64)  # 4096 points on [0,64)^2
    zpath, lpath = tmp_path / "z", tmp_path / "linear"
    write_zordered(df, zpath, ["x", "y"], n_files=16, bits=6)
    # 1-D baseline: same file count, sorted by x only
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(str(lpath))
    )
    box = {"x": (8.0, 15.0), "y": (8.0, 15.0)}  # 1/64 of the area
    zs = prune_stats(zpath, box)
    ls = prune_stats(lpath, box)
    # linear layout prunes only the x stripes (~7/8); z-order also
    # prunes inside the surviving stripe via y stats
    assert zs["prune_fraction"] > ls["prune_fraction"]
    assert zs["prune_fraction"] >= 0.85
    # and the data is intact
    back = spark.read.parquet(str(zpath))
    assert back.count() == 4096
    hit = back.filter(
        (F.col("x") >= 8) & (F.col("x") <= 15)
        & (F.col("y") >= 8) & (F.col("y") <= 15)
    )
    assert hit.count() == 64


def test_prune_stats_never_skips_matching_groups(spark, tmp_path):
    # soundness: a skippable row group must contain NO matching rows —
    # verify by comparing the full-scan answer on both layouts
    df = _grid(spark, 32)
    zpath = tmp_path / "z2"
    write_zordered(df, zpath, ["x", "y"], n_files=8, bits=5)
    back = spark.read.parquet(str(zpath))
    box = {"x": (3.0, 9.0), "y": (20.0, 28.0)}
    expected = df.filter(
        (F.col("x") >= 3) & (F.col("x") <= 9)
        & (F.col("y") >= 20) & (F.col("y") <= 28)
    ).count()
    got = back.filter(
        (F.col("x") >= 3) & (F.col("x") <= 9)
        & (F.col("y") >= 20) & (F.col("y") <= 28)
    ).count()
    assert got == expected > 0
