"""applyInPandasWithState likelihood: chunked (micro-batch) scoring must
equal the batch exact kernel on the concatenation, to 1e-12."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.likelihood import anomaly_likelihood_exact
from htm_streamer_spark.streaming.stateful import (
    likelihood_state_fn,
    stateful_likelihood_stream,
)

PARAMS = dict(
    learning_period=30,
    estimation_samples=20,
    historic_window=200,
    reestimation_period=25,
    averaging_window=10,
)


class FakeState:
    """Minimal stand-in for pyspark GroupState (get/update/exists)."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _series(n=400, seed=3):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0.02, 0.2, n)
    scores[150:155] = 0.97  # anomaly burst (red-zone filter territory)
    scores[300:303] = 0.95
    values = np.cumsum(rng.normal(0, 1, n)) + 50
    ts = pd.date_range("2026-01-01", periods=n, freq="min")
    return pd.DataFrame({"series_id": "s0", "ts": ts, "value": values, "score": scores})


@pytest.mark.parametrize("chunks", [1, 3, 7, 40])
def test_chunked_equals_batch_kernel(spark, chunks):
    pdf = _series()
    want = (
        anomaly_likelihood_exact(spark.createDataFrame(pdf), **PARAMS)
        .orderBy("ts")
        .toPandas()["anomaly_likelihood"]
        .to_numpy()
    )

    fn = likelihood_state_fn(**PARAMS)
    state = FakeState()
    outs = []
    for chunk in np.array_split(pdf, chunks):
        outs.extend(fn(("s0",), iter([chunk.reset_index(drop=True)]), state))
    got = pd.concat(outs).sort_values("ts")["anomaly_likelihood"].to_numpy()

    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_state_is_bounded(spark):
    """State never exceeds historic_window + averaging tail regardless of
    how many rows stream through."""
    fn = likelihood_state_fn(**PARAMS)
    state = FakeState()
    pdf = _series(n=1000)
    for chunk in np.array_split(pdf, 10):
        list(fn(("s0",), iter([chunk.reset_index(drop=True)]), state))
    n_seen, ma_tail, hist_s, hist_v, *_ = state.get
    assert n_seen == 1000
    assert len(hist_s) == PARAMS["historic_window"]
    assert len(hist_v) == PARAMS["historic_window"]
    assert len(ma_tail) == PARAMS["averaging_window"] - 1


@pytest.mark.slow
def test_real_streaming_query_matches_batch(spark, tmp_path):
    """End-to-end through a real Structured Streaming query: file source
    fed one file per micro-batch, state store persisting between them."""
    pdf = _series(n=300)
    src = tmp_path / "stream_src"
    src.mkdir()
    out_dir = tmp_path / "out"
    chunks = np.array_split(pdf, 3)
    for i, c in enumerate(chunks):
        spark.createDataFrame(c.reset_index(drop=True)).coalesce(1).write.parquet(
            str(src / f"f{i}.parquet")
        )
    stream = (
        spark.readStream.schema("series_id string, ts timestamp, value double, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    scored = stateful_likelihood_stream(stream, **PARAMS)
    q = (
        scored.writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(str(out_dir))
        .orderBy("ts")
        .toPandas()["anomaly_likelihood"]
        .to_numpy()
    )
    want = (
        anomaly_likelihood_exact(spark.createDataFrame(pdf), **PARAMS)
        .orderBy("ts")
        .toPandas()["anomaly_likelihood"]
        .to_numpy()
    )
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)
