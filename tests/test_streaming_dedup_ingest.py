"""Cross-batch streaming dedup ingest: the catalog holds ONE row per
content digest across the whole stream history (first-wins by id),
replays are no-ops, and a live availableNow stream lands deduped."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from htm_streamer_spark.sources.table_io import ManifestCatalog
from htm_streamer_spark.streaming.upsert import (
    make_upsert_batch_processor,
    start_streaming_dedup_ingest,
)

SCHEMA = "doc_id long, text string"


def _digested(df):
    return df.withColumn("digest", F.md5(F.col("text"))).withColumn(
        "__neg_id", -F.col("doc_id")
    )


def _docs_state(spark, cat, table="docs"):
    df = cat.read(spark, table, latest_only=True)
    return {r["digest"]: r["doc_id"] for r in df.collect()} if df is not None else {}


def test_cross_batch_first_wins(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    proc = make_upsert_batch_processor(cat, "docs", ["digest"], "__neg_id")
    # batch 0: A(1), B(2); batch 1: dup of A under a LARGER id + new C
    b0 = _digested(spark.createDataFrame([(1, "aaa"), (2, "bbb")], SCHEMA))
    b1 = _digested(spark.createDataFrame([(3, "aaa"), (4, "ccc")], SCHEMA))
    proc(b0, 0)
    proc(b1, 1)
    state = _docs_state(spark, cat)
    assert len(state) == 3
    assert state[[k for k, v in state.items() if v in (1, 3)][0]] == 1  # A kept id 1
    # a replayed epoch is a no-op
    v = cat.version()
    proc(b1, 1)
    assert cat.version() == v


def test_within_batch_duplicates_collapse_to_min_id(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    proc = make_upsert_batch_processor(cat, "docs", ["digest"], "__neg_id")
    b = _digested(
        spark.createDataFrame([(9, "same"), (3, "same"), (5, "same")], SCHEMA)
    )
    proc(b, 0)
    state = _docs_state(spark, cat)
    assert list(state.values()) == [3]


def test_smaller_id_arriving_later_becomes_canonical(spark, tmp_path):
    # first-wins is by ID, not arrival: a later batch carrying a
    # smaller id for the same content replaces the canonical row —
    # the deterministic "min id over history" contract of exact dedup
    cat = ManifestCatalog(tmp_path / "cat")
    proc = make_upsert_batch_processor(cat, "docs", ["digest"], "__neg_id")
    proc(_digested(spark.createDataFrame([(7, "xxx")], SCHEMA)), 0)
    proc(_digested(spark.createDataFrame([(2, "xxx")], SCHEMA)), 1)
    assert list(_docs_state(spark, cat).values()) == [2]


def test_live_stream_lands_deduped(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for name, rows in [
        ("f0", [(1, "aaa"), (2, "bbb")]),
        ("f1", [(3, "aaa"), (4, "ccc"), (5, "ccc")]),
    ]:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            f"{src}/{name}.parquet",
        )
    cat = ManifestCatalog(tmp_path / "cat")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = start_streaming_dedup_ingest(
        stream,
        cat,
        "docs",
        checkpoint_location=str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(120)
    state = _docs_state(spark, cat)
    # 5 input rows, 3 distinct contents; canonical ids are the minima
    assert sorted(state.values()) == [1, 2, 4]
