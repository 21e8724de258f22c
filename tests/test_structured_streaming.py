"""Structured Streaming binding: availableNow over the sequences dir →
same verdicts as the batch engine."""

from __future__ import annotations

import pytest

from htm_streamer_spark.config import EngineConfig
from htm_streamer_spark.sources.table_io import ManifestCatalog
from htm_streamer_spark.streaming.incremental import CheckpointStore
from htm_streamer_spark.streaming.structured import validate_stream


@pytest.mark.slow
def test_stream_available_now_validates_all(spark, tiny_dir, cfg, tmp_path):
    catalog = ManifestCatalog(tmp_path / "stream_ckpt")
    q = validate_stream(
        spark,
        tiny_dir,
        catalog,
        cfg,
        checkpoint_location=str(tmp_path / "spark_ckpt"),
        available_now=True,
    )
    q.awaitTermination(300)
    store = CheckpointStore(catalog)
    verdicts = store.verdicts(spark).toPandas()
    # every partition got a verdict (micro-batching may split them, but
    # the union covers all 10)
    assert set(verdicts["part_id"]) == set(range(10))
    viol = store.violations(spark)
    assert viol.count() > 0


def test_replayed_epoch_is_noop(spark, tiny_dir, cfg, tmp_path):
    """ADVICE regression: if the catalog commit lands but the streaming
    checkpoint write does not, Spark replays the micro-batch with the
    same epoch_id — the second commit must be a no-op, not duplicate
    verdict/violation rows."""
    from htm_streamer_spark.plans.validation_plan import load_sequences
    from htm_streamer_spark.streaming import structured

    catalog = ManifestCatalog(tmp_path / "replay_ckpt")
    batch = load_sequences(spark, tiny_dir)
    store = CheckpointStore(catalog)

    # capture validate_stream's foreachBatch callback without starting a
    # real query, then drive it directly as Spark would
    def make_cb():
        holder = {}

        class FakeWriter:
            def foreachBatch(self, fn):
                holder["fn"] = fn
                return self

            def outputMode(self, *_):
                return self

            def option(self, *_):
                return self

            def trigger(self, **_):
                return self

            def start(self):
                return None

        class FakeStream:
            @property
            def writeStream(self):
                return FakeWriter()

        import unittest.mock as mock

        with mock.patch.object(structured, "read_sequences_stream", return_value=FakeStream()):
            structured.validate_stream(spark, tiny_dir, catalog, cfg)
        return holder["fn"]

    cb = make_cb()
    cb(batch, 0)
    v_after_first = store.verdicts(spark).count()
    version_after_first = catalog.version()
    assert v_after_first > 0

    cb(batch, 0)  # replay of the SAME epoch → must no-op
    assert store.verdicts(spark).count() == v_after_first
    assert catalog.version() == version_after_first

    cb(batch, 1)  # a NEW epoch still commits
    assert catalog.version() != version_after_first


def test_sampling_mode_spans_micro_batches(spark, tiny_dir, cfg, tmp_path):
    """A first micro-batch smaller than cfg.baseline_partitions must NOT
    freeze an undersized baseline: pending histograms accumulate across
    batches and the committed baseline equals the one a single batch run
    over the same first K partitions would fit."""
    import json

    from pyspark.sql import functions as F

    from htm_streamer_spark.plans.validation_plan import compute_baseline, load_sequences
    from htm_streamer_spark.streaming import structured

    catalog = ManifestCatalog(tmp_path / "sampling_ckpt")
    full = load_sequences(spark, tiny_dir)

    def make_cb():
        holder = {}

        class FakeWriter:
            def foreachBatch(self, fn):
                holder["fn"] = fn
                return self

            def outputMode(self, *_):
                return self

            def option(self, *_):
                return self

            def trigger(self, **_):
                return self

            def start(self):
                return None

        class FakeStream:
            @property
            def writeStream(self):
                return FakeWriter()

        import unittest.mock as mock

        with mock.patch.object(structured, "read_sequences_stream", return_value=FakeStream()):
            structured.validate_stream(spark, tiny_dir, catalog, cfg)
        return holder["fn"]

    cb = make_cb()
    store = CheckpointStore(catalog)
    # micro-batches of 2 partitions each; K = 4
    cb(full.filter(F.col("part_id").isin([0, 1])), 0)
    assert store.baseline(spark, cfg) is None  # still sampling
    assert json.loads(catalog.prop("pending_baseline_parts")) == [0, 1]
    v = store.verdicts(spark).toPandas()
    assert set(v["status"]) <= {"probation", "fail"}  # no drift verdicts yet

    cb(full.filter(F.col("part_id").isin([2, 3])), 1)
    base = store.baseline(spark, cfg)
    assert base is not None and base["part_ids"] == [0, 1, 2, 3]

    # committed baseline == single-shot fit over partitions 0..3
    want = compute_baseline(full.filter(F.col("part_id").isin([0, 1, 2, 3])), cfg, [0, 1, 2, 3])
    got_tok = {(r["bucket"]): r["cnt"] for r in base["tok"].collect()}
    want_tok = {(r["bucket"]): r["cnt"] for r in want["tok"].collect()}
    assert got_tok == want_tok

    # a later batch runs in 'running' mode against the frozen baseline
    cb(full.filter(F.col("part_id").isin([4, 5, 6, 7, 8, 9])), 2)
    v = store.verdicts(spark).toPandas()
    assert set(v["part_id"]) == set(range(10))
