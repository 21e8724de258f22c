"""Multimodal plumbing: schema, Arrow batch shape, partitioning, and the
clearly-marked decode stub."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from htm_streamer_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synthesize_media(spark, n=48)


def test_extract_features_fake(media):
    got = extract_features(media, fake=True).collect()
    assert len(got) == 48
    for r in got:
        assert len(r["features"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        assert abs(sum(r["features"]) - 1.0) < 1e-9  # normalized histogram


def test_extract_features_deterministic(media):
    a = sorted(extract_features(media, fake=True).collect(), key=lambda r: r["media_id"])
    b = sorted(extract_features(media, fake=True).collect(), key=lambda r: r["media_id"])
    assert [r["features"] for r in a] == [r["features"] for r in b]


def test_real_decode_is_stubbed(media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        extract_features(media, fake=False).collect()


def test_frame_sample_plan(media):
    plan = frame_sample_plan(media, every_ms=500)
    rows = plan.collect()
    assert all(r["frame_ts_ms"] % 500 == 0 for r in rows)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert plan.select("media_id").distinct().count() == n_videos


def test_blob_dropped_downstream(media):
    out = extract_features(media, fake=True)
    assert "content" not in out.columns  # no blob through the shuffle
