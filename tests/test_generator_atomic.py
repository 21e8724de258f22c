"""Fixture generation must be kill-safe: a generation interrupted
mid-write (observed: a bench run killed by timeout left a 100-partition
table with only 80 partitions, silently reused by every later run) may
never be mistaken for a complete table."""

from __future__ import annotations

import shutil

from htm_streamer_spark.fixtures.generator import write_sequences_parquet


def test_partial_table_is_regenerated(tmp_path):
    d = tmp_path / "seq"
    write_sequences_parquet(d, n_partitions=4, rows_per_partition=100)
    assert (d / "_SUCCESS").exists()
    # simulate an interrupted write: missing partition, no marker
    shutil.rmtree(d / "part_id=3")
    (d / "_SUCCESS").unlink()
    write_sequences_parquet(d, n_partitions=4, rows_per_partition=100)
    assert (d / "part_id=3").exists()
    assert (d / "_SUCCESS").exists()


def test_complete_table_is_reused_not_rewritten(tmp_path):
    d = tmp_path / "seq"
    write_sequences_parquet(d, n_partitions=2, rows_per_partition=50)
    mtime = (d / "_SUCCESS").stat().st_mtime_ns
    write_sequences_parquet(d, n_partitions=2, rows_per_partition=50)
    assert (d / "_SUCCESS").stat().st_mtime_ns == mtime


def test_stale_tmp_dir_is_cleared(tmp_path):
    d = tmp_path / "seq"
    tmp = tmp_path / "seq.tmp"
    tmp.mkdir()
    (tmp / "junk").write_text("leftover from a killed run")
    write_sequences_parquet(d, n_partitions=2, rows_per_partition=50)
    assert (d / "_SUCCESS").exists()
    assert not (d / "junk").exists()
    assert not tmp.exists()
