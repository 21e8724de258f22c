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


def test_multichunk_micro_batch_scored_in_order(spark):
    """ADVICE regression: applyInPandasWithState splits a group's
    micro-batch into multiple Arrow chunks in ARBITRARY shuffle order.
    The state fn must materialize + sort the whole batch once — sorting
    each chunk independently silently mis-orders the series."""
    pdf = _series(n=400)
    want = (
        anomaly_likelihood_exact(spark.createDataFrame(pdf), **PARAMS)
        .orderBy("ts")
        .toPandas()["anomaly_likelihood"]
        .to_numpy()
    )

    fn = likelihood_state_fn(**PARAMS)
    state = FakeState()
    # one micro-batch delivered as 5 chunks in scrambled order
    chunks = np.array_split(pdf, 5)
    scrambled = [chunks[i].reset_index(drop=True) for i in (3, 0, 4, 2, 1)]
    outs = list(fn(("s0",), iter(scrambled), state))
    got = pd.concat(outs).sort_values("ts")["anomaly_likelihood"].to_numpy()
    assert len(got) == len(want)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-12)


def test_out_of_order_micro_batch_raises(spark):
    """Monotone-time guard: a micro-batch whose earliest ts precedes the
    state's last scored ts must raise, not silently produce wrong
    likelihoods."""
    pdf = _series(n=100)
    fn = likelihood_state_fn(**PARAMS)
    state = FakeState()
    first, second = pdf.iloc[50:], pdf.iloc[:50]  # later half first
    list(fn(("s0",), iter([first.reset_index(drop=True)]), state))
    with pytest.raises(ValueError, match="out-of-order micro-batch"):
        list(fn(("s0",), iter([second.reset_index(drop=True)]), state))


def test_empty_micro_batch_keeps_state(spark):
    fn = likelihood_state_fn(**PARAMS)
    state = FakeState()
    pdf = _series(n=50)
    list(fn(("s0",), iter([pdf]), state))
    before = state.get
    list(fn(("s0",), iter([pdf.iloc[0:0]]), state))  # empty batch
    assert state.get == before


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
