"""Event-time windowed aggregation with watermark: batch/stream parity
and append-mode late-data semantics over a real file-source stream."""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.streaming.windows import windowed_event_stats

SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def _write(dirpath, rows, name):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
        }
    )
    pq.write_table(tbl, f"{dirpath}/{name}.parquet")


def _ts(minute):
    # deterministic event times: 2024-01-01 00:<minute>
    import datetime

    return datetime.datetime(2024, 1, 1, minute // 60, minute % 60)


def test_batch_twin_matches_manual_grouping(spark, tmp_path):
    rows = [
        (1, _ts(1), "a", 1.0),
        (2, _ts(9), "a", 2.0),
        (3, _ts(11), "a", 4.0),
        (4, _ts(25), "b", 8.0),
    ]
    d = tmp_path / "batch"
    d.mkdir()
    _write(d, rows, "f0")
    df = spark.read.schema(SCHEMA).parquet(str(d))
    got = {
        (r.window_start.minute, r.event_type): (r.n_events, r.sum_value)
        for r in windowed_event_stats(df, watermark=None).collect()
    }
    assert got == {(0, "a"): (2, 3.0), (10, "a"): (1, 4.0), (20, "b"): (1, 8.0)}


@pytest.mark.slow
def test_append_mode_emits_once_and_drops_late(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write(src, [(1, _ts(1), "a", 1.0), (2, _ts(5), "a", 2.0)], "f0")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = windowed_event_stats(stream, window="10 minutes", watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark = 00:05 - 5min = 00:00 → window [00:00,00:10) not yet
        # finalized, nothing emitted
        assert spark.sql("SELECT * FROM win_test").count() == 0

        # advance event time far enough to finalize the first window,
        # and sneak in a LATE row for the already-passed window
        _write(src, [(3, _ts(20), "a", 4.0), (4, _ts(2), "a", 100.0)], "f1")
        q.processAllAvailable()
        # one more empty micro-batch so the new watermark (00:15)
        # finalizes [00:00,00:10)
        _write(src, [(5, _ts(21), "b", 8.0)], "f2")
        q.processAllAvailable()
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT window_start, event_type, n_events, sum_value FROM win_test"
            ).collect()
            if rows:
                break
            q.processAllAvailable()
        finalized = {
            (r.window_start.minute, r.event_type): (r.n_events, r.sum_value)
            for r in rows
        }
        # Spark filters late rows with the PREVIOUS micro-batch's
        # watermark: when f1 arrives the previous watermark is 00:00,
        # so event_id=4 (ts 00:02) is still admitted into state, and
        # the window finalizes as 3 events / 103.0 (verified against a
        # live run; this is the documented previous-watermark rule).
        assert finalized.get((0, "a")) == (3, 103.0), finalized

        # a row later than the CURRENT watermark at arrival is dropped:
        # watermark is now >= 00:15; send ts 00:03
        _write(src, [(6, _ts(3), "a", 1000.0), (7, _ts(40), "a", 0.5)], "f3")
        q.processAllAvailable()
        _write(src, [(8, _ts(55), "a", 0.25)], "f4")
        q.processAllAvailable()
        all_rows = spark.sql(
            "SELECT window_start, event_type, n_events, sum_value FROM win_test"
        ).collect()
        sums = [r.sum_value for r in all_rows]
        assert not any(abs(s - 1000.0) < 1e-9 or s > 999.0 for s in sums), sums
    finally:
        q.stop()


def test_session_window_batch_merges_and_splits(spark, tmp_path):
    """Batch semantics of F.session_window, pinning the exact boundary:
    spacing of EXACTLY the gap still MERGES (touching intervals
    coalesce — the end extends to last ts + gap); a new session needs
    spacing strictly greater. The DuckDB oracle's lag formulation uses
    the same `diff > gap` rule."""
    from htm_streamer_spark.streaming.windows import session_window_stats

    d = tmp_path / "sess"
    d.mkdir()
    rows = [
        (1, _ts(0), "u1", 1.0),
        (2, _ts(30), "u1", 2.0),    # 30min < 1h gap → same session
        (3, _ts(90), "u1", 4.0),    # EXACTLY 1h after #2 → still merges
        (4, _ts(151), "u1", 16.0),  # 61min after #3 → NEW session
        (5, _ts(10), "u2", 8.0),
    ]
    # session_window_stats keys on user_id; reuse event_type as the user
    _write(d, rows, "f0")
    df = spark.read.schema(SCHEMA).parquet(str(d)).withColumnRenamed(
        "event_type", "user_id"
    )
    got = {
        (r.user_id, r.session_start.minute, r.session_end.minute): (
            r.n_events,
            r.sum_value,
        )
        for r in session_window_stats(df, gap="1 hour", watermark=None).collect()
    }
    assert got == {
        ("u1", 0, 30): (3, 7.0),    # [00:00, 02:30): last ts 01:30 + 1h
        ("u1", 31, 31): (1, 16.0),  # [02:31, 03:31)
        ("u2", 10, 10): (1, 8.0),   # [00:10, 01:10)
    }, got


def test_session_window_append_mode_emits_on_watermark(spark, tmp_path):
    """Live Structured Streaming session windows: an open session is
    NOT emitted until the watermark passes its end; then it is emitted
    exactly once with the merged aggregate."""
    from htm_streamer_spark.streaming.windows import session_window_stats

    src = tmp_path / "sess_src"
    src.mkdir()
    ckpt = str(tmp_path / "sess_ckpt")
    # two events 5min apart → one session [00:01, 00:06+gap)
    _write(src, [(1, _ts(1), "u1", 1.0), (2, _ts(6), "u1", 2.0)], "f0")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    ).withColumnRenamed("event_type", "user_id")
    out = session_window_stats(stream, gap="10 minutes", watermark="5 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sess_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark 00:06-5min = 00:01 < session end 00:16 → nothing out
        assert spark.sql("SELECT * FROM sess_test").count() == 0

        # push event time forward so the watermark passes 00:16
        _write(src, [(3, _ts(30), "u2", 8.0)], "f1")
        q.processAllAvailable()
        _write(src, [(4, _ts(31), "u2", 16.0)], "f2")
        q.processAllAvailable()
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = spark.sql(
                "SELECT user_id, session_start, session_end, n_events, sum_value"
                " FROM sess_test"
            ).collect()
            if rows:
                break
            q.processAllAvailable()
        got = {
            (r.user_id, r.session_start.minute, r.session_end.minute): (
                r.n_events,
                r.sum_value,
            )
            for r in rows
        }
        # the merged u1 session [00:01, 00:16) emitted exactly once
        assert got == {("u1", 1, 16): (2, 3.0)}, got
    finally:
        q.stop()


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, tmp_path):
    from htm_streamer_spark.streaming.windows import streaming_dedup

    src = tmp_path / "dsrc"
    src.mkdir()
    ckpt = str(tmp_path / "dckpt")
    # duplicate event_id=1 inside the same horizon; unique id=2
    _write(src, [(1, _ts(1), "a", 1.0), (2, _ts(2), "a", 2.0)], "f0")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = streaming_dedup(stream, ["event_id"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        # a duplicate of id=1 arriving in a later micro-batch, still
        # within the watermark horizon → suppressed
        _write(src, [(1, _ts(3), "a", 99.0), (3, _ts(4), "a", 3.0)], "f1")
        q.processAllAvailable()
        rows = spark.sql("SELECT event_id, value FROM dedup_test").collect()
        got = sorted((r.event_id, r.value) for r in rows)
        assert got == [(1, 1.0), (2, 2.0), (3, 3.0)]
    finally:
        q.stop()


def test_batch_twin_dedup(spark, tmp_path):
    from htm_streamer_spark.streaming.windows import streaming_dedup

    d = tmp_path / "bdedup"
    d.mkdir()
    _write(d, [(1, _ts(1), "a", 1.0), (1, _ts(3), "a", 99.0), (2, _ts(2), "b", 2.0)], "f0")
    df = spark.read.schema(SCHEMA).parquet(str(d))
    got = {r.event_id: r for r in streaming_dedup(df, ["event_id"]).collect()}
    # deterministic contract: the EARLIEST row by ts survives, with its
    # payload columns intact — not an arbitrary partition-order row
    assert set(got) == {1, 2}
    assert got[1].value == 1.0 and got[1].ts == _ts(1)
    assert got[2].value == 2.0


def test_batch_twin_dedup_matches_pandas_oracle(spark, tmp_path):
    """The batch twin equals pandas sort_values(ts, cols) +
    drop_duplicates(keep='first') — the documented first-by-ts
    selection — on data with ts ties broken by payload columns."""
    from htm_streamer_spark.streaming.windows import streaming_dedup

    d = tmp_path / "bdedup2"
    d.mkdir()
    rows = []
    for i in range(200):
        k = i % 17
        # several rows per key; some share the same ts (tie-break path)
        rows.append((k, _ts(5 + (i * 7) % 13), "t%d" % (i % 3), float(i)))
    _write(d, rows, "f0")
    df = spark.read.schema(SCHEMA).parquet(str(d)).repartition(8)
    got = {
        r.event_id: (r.ts, r.event_type, r.value)
        for r in streaming_dedup(df, ["event_id"]).collect()
    }
    pdf = df.toPandas().sort_values(["ts", "event_type", "value"], kind="mergesort")
    want = {
        r.event_id: (r.ts.to_pydatetime(), r.event_type, r.value)
        for r in pdf.drop_duplicates("event_id", keep="first").itertuples()
    }
    assert got == want
