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
