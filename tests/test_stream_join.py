"""Stream-stream interval join: batch-twin semantics (boundaries,
inclusivity, key isolation) and live two-stream state-bounded execution
with watermark-dropped late rows."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.streaming.joins import interval_join_streams

SCHEMA = "event_id long, ts timestamp, user_id string, event_type string"


def _ts(minute, second=0):
    return datetime.datetime(2024, 1, 1, minute // 60, minute % 60, second)


def _write(dirpath, rows, name):
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.string()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, f"{dirpath}/{name}.parquet")


def _sides(spark, rows):
    e = spark.createDataFrame(
        [(r[0], r[1], r[2], r[3]) for r in rows], SCHEMA
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    buys = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
    ).withColumnRenamed("u2", "user_id")
    return clicks, buys


def test_batch_twin_boundaries_and_keys(spark):
    rows = [
        (1, _ts(0), "u1", "click"),
        (2, _ts(10), "u1", "purchase"),   # exactly upper bound: included
        (3, _ts(0, 1), "u1", "purchase"),  # 1s after: included
        (4, _ts(11), "u1", "purchase"),   # beyond upper: excluded
        (5, _ts(0), "u2", "purchase"),    # other key: excluded
        (6, _ts(5), "u3", "purchase"),    # no click for key: excluded
        (7, _ts(20), "u1", "purchase"),   # before ANY u1 click? no — after
    ]
    clicks, buys = _sides(spark, rows)
    out = interval_join_streams(
        clicks, buys, "user_id",
        left_ts="click_ts", right_ts="buy_ts",
        lower="0 seconds", upper="10 minutes", watermark=None,
    )
    got = sorted((r.click_id, r.buy_id) for r in out.collect())
    assert got == [(1, 2), (1, 3)]


def test_purchase_before_click_excluded(spark):
    rows = [
        (1, _ts(5), "u1", "click"),
        (2, _ts(4), "u1", "purchase"),  # before the click: lower=0 excludes
    ]
    clicks, buys = _sides(spark, rows)
    out = interval_join_streams(
        clicks, buys, "user_id",
        left_ts="click_ts", right_ts="buy_ts", watermark=None,
    )
    assert out.count() == 0


def test_same_ts_name_rejected(spark):
    clicks, buys = _sides(spark, [(1, _ts(0), "u1", "click")])
    with pytest.raises(ValueError):
        interval_join_streams(
            clicks, buys.withColumnRenamed("buy_ts", "click_ts"), "user_id",
            left_ts="click_ts", right_ts="click_ts",
        )


@pytest.mark.slow
def test_live_two_stream_join_matches_batch_and_drops_late(spark, tmp_path):
    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(), rsrc.mkdir()
    ckpt = str(tmp_path / "ckpt")
    # batch 0: click@1 (u1); purchase@3 (u1) -> pair once watermarks pass
    _write(lsrc, [(1, _ts(1), "u1", "click")], "f0")
    _write(rsrc, [(2, _ts(3), "u1", "purchase")], "f0")

    def side(src, typ, idc, tsc):
        s = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        keep = s.where(F.col("event_type") == typ)
        return keep.select(
            "user_id", F.col("event_id").alias(idc), F.col("ts").alias(tsc)
        )

    out = interval_join_streams(
        side(lsrc, "click", "click_id", "click_ts"),
        side(rsrc, "purchase", "buy_id", "buy_ts"),
        "user_id",
        left_ts="click_ts",
        right_ts="buy_ts",
        lower="0 seconds",
        upper="10 minutes",
        watermark="5 minutes",
    ).select("user_id", "click_id", "buy_id")
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.click_id, r.buy_id)
            for r in spark.sql("SELECT * FROM ssj_test").collect()
        }
        assert got == {(1, 2)}  # inner join emits matches immediately

        # advance both watermarks far past minute 1, then deliver a
        # purchase at minute 2 — older than the click-side watermark's
        # state horizon, so the (1,3) pair must NOT appear
        _write(lsrc, [(8, _ts(60), "u9", "click")], "f1")
        _write(rsrc, [(9, _ts(60), "u9", "purchase")], "f1")
        q.processAllAvailable()
        _write(rsrc, [(3, _ts(2), "u1", "purchase")], "f2")
        q.processAllAvailable()
        got = {
            (r.click_id, r.buy_id)
            for r in spark.sql("SELECT * FROM ssj_test").collect()
        }
        assert (1, 3) not in got
        assert (8, 9) in got
    finally:
        q.stop()


@pytest.mark.slow
def test_stream_static_enrichment_rereads_dim(spark, tmp_path):
    """Stream-static join: each micro-batch joins against the CURRENT
    state of the static side — Spark re-resolves the dim per batch, so
    an updated dim parquet enriches later batches differently. This is
    the idiomatic streaming enrichment (no state, broadcastable dim)."""
    src, dim = tmp_path / "src", tmp_path / "dim"
    src.mkdir(), dim.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_dim(label):
        import pyarrow as pa
        import pyarrow.parquet as pq2

        pq2.write_table(
            pa.table({"user_id": pa.array(["u1"], pa.string()),
                      "segment": pa.array([label], pa.string())}),
            f"{dim}/d.parquet",
        )

    write_dim("bronze")
    _write(src, [(1, _ts(1), "u1", "click")], "f0")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    static = spark.read.schema("user_id string, segment string").parquet(str(dim))
    out = stream.join(F.broadcast(static), "user_id", "left")
    q = (
        out.select("event_id", "segment")
        .writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.event_id: r.segment for r in spark.sql("SELECT * FROM enrich_test").collect()}
        assert got == {1: "bronze"}
        write_dim("gold")  # dim updated between micro-batches
        _write(src, [(2, _ts(2), "u1", "click")], "f1")
        q.processAllAvailable()
        got = {r.event_id: r.segment for r in spark.sql("SELECT * FROM enrich_test").collect()}
        assert got == {1: "bronze", 2: "gold"}
    finally:
        q.stop()
