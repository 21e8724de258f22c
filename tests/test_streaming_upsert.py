"""Streaming MERGE sink: live multi-batch upserts equal last-writer-
wins, epoch replay is a no-op (guard rides in the same atomic commit as
the data), and a fresh checkpoint identity is never swallowed by a
stale guard."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from htm_streamer_spark.sources.table_io import ManifestCatalog
from htm_streamer_spark.streaming.upsert import (
    make_upsert_batch_processor,
    start_streaming_upsert,
)

SCHEMA = "k long, v string, updated_at long"


def _write(dirpath, rows, name):
    pq.write_table(
        pa.table(
            {
                "k": pa.array([r[0] for r in rows], pa.int64()),
                "v": pa.array([r[1] for r in rows], pa.string()),
                "updated_at": pa.array([r[2] for r in rows], pa.int64()),
            }
        ),
        f"{dirpath}/{name}.parquet",
    )


def _state(spark, cat):
    df = cat.read(spark, "t", latest_only=True)
    return {r.k: (r.v, r.updated_at) for r in df.collect()} if df is not None else {}


def test_batch_processor_applies_and_guards_replay(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    proc = make_upsert_batch_processor(cat, "t", ["k"], "updated_at", n_buckets=4)
    b0 = spark.createDataFrame([(1, "a", 10), (2, "b", 10)], SCHEMA)
    proc(b0, 0)
    v_after = cat.version()
    # crash-window replay: same epoch id again -> must be a pure no-op
    proc(b0, 0)
    assert cat.version() == v_after
    assert _state(spark, cat) == {1: ("a", 10), 2: ("b", 10)}
    # next epoch applies; stale update for k=1 loses, k=2 advances
    proc(spark.createDataFrame([(1, "stale", 5), (2, "b2", 20)], SCHEMA), 1)
    assert _state(spark, cat) == {1: ("a", 10), 2: ("b2", 20)}


def test_fresh_checkpoint_identity_not_swallowed(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    p1 = make_upsert_batch_processor(
        cat, "t", ["k"], "updated_at", checkpoint_location="ckpt-a"
    )
    p1(spark.createDataFrame([(1, "a", 10)], SCHEMA), 7)
    # a NEW query identity restarts epochs at 0 — must still apply
    p2 = make_upsert_batch_processor(
        cat, "t", ["k"], "updated_at", checkpoint_location="ckpt-b"
    )
    p2(spark.createDataFrame([(1, "b", 20)], SCHEMA), 0)
    assert _state(spark, cat) == {1: ("b", 20)}


@pytest.mark.slow
def test_live_streaming_upsert_last_writer_wins(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    cat = ManifestCatalog(tmp_path / "cat")
    _write(src, [(1, "a", 10), (2, "b", 10)], "f0")
    _write(src, [(1, "a2", 20), (3, "c", 5)], "f1")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = start_streaming_upsert(
        stream, cat, "t", ["k"], "updated_at",
        n_buckets=4,
        checkpoint_location=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _state(spark, cat) == {1: ("a2", 20), 2: ("b", 10), 3: ("c", 5)}
