"""transformWithStateInPandas running z-score (streaming/tws.py):
kernel parity vs batch twin and pandas, chunking invariance, the
out-of-order guard, and a live stream whose state spans micro-batches."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.streaming.tws import (
    running_zscore_batch,
    running_zscore_chunk,
    tws_running_zscore,
)


def _series(n=300, seed=11, key="k0"):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "key": key,
            "ts": pd.date_range("2026-02-01", periods=n, freq="min"),
            "value": rng.normal(10, 3, n),
        }
    )


def _pandas_reference(pdf):
    out = []
    cnt = s1 = s2 = 0.0
    for v in pdf["value"]:
        if cnt >= 2:
            m = s1 / cnt
            var = max(s2 / cnt - m * m, 1e-9)
            out.append((v - m) / np.sqrt(var))
        else:
            out.append(0.0)
        cnt += 1
        s1 += v
        s2 += v * v
    return np.array(out)


@pytest.mark.parametrize("chunks", [1, 4, 17])
def test_chunked_kernel_equals_pandas_reference(chunks):
    pdf = _series()
    want = _pandas_reference(pdf)
    state, outs = None, []
    for c in np.array_split(pdf, chunks):
        state, out = running_zscore_chunk(state, c.reset_index(drop=True))
        outs.append(out)
    got = pd.concat(outs)["zscore"].to_numpy()
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert state[0] == len(pdf)


def test_out_of_order_batch_raises():
    pdf = _series(50)
    state, _ = running_zscore_chunk(None, pdf)
    with pytest.raises(ValueError, match="out-of-order"):
        running_zscore_chunk(state, pdf.iloc[:5].reset_index(drop=True))


def test_batch_twin_equals_kernel(spark):
    pdf = pd.concat([_series(120, seed=1, key="a"), _series(80, seed=2, key="b")])
    got = (
        running_zscore_batch(
            spark.createDataFrame(pdf), "key", "ts", "value"
        )
        .orderBy("key", "ts")
        .toPandas()
    )
    for key, grp in pdf.groupby("key"):
        want = _pandas_reference(grp.sort_values("ts"))
        sel = got[got["key"] == key].sort_values("ts")["zscore"].to_numpy()
        np.testing.assert_allclose(sel, want, atol=1e-10)


def test_live_stream_state_spans_micro_batches(spark, tmp_path):
    # Spark's transformWithState Python worker speaks protobuf to the
    # state server; without the protobuf package the worker crashes at
    # launch. Same gating pattern as the Iceberg-jar smoke test.
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf "
        "(not shipped in this container); kernel/batch-twin parity and "
        "the wiring are covered by the other tests",
    )
    pdf = _series(200, seed=7)
    # two files -> two micro-batches with maxFilesPerTrigger=1; the
    # second half's scores depend on state built from the first half
    (tmp_path / "in").mkdir()
    pdf.iloc[:120].to_parquet(tmp_path / "in" / "a.parquet", index=False)
    pdf.iloc[120:].to_parquet(tmp_path / "in" / "b.parquet", index=False)
    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(tmp_path / "in"))
    )
    out = tws_running_zscore(stream, "key", "ts", "value", ttl_ms=3_600_000)
    # transformWithState requires the RocksDB state store provider
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
    finally:
        if old is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, old)
    got = (
        spark.read.parquet(str(tmp_path / "out"))
        .orderBy("ts")
        .toPandas()
    )
    assert len(got) == 200
    want = _pandas_reference(pdf)
    np.testing.assert_allclose(got["zscore"].to_numpy(), want, atol=1e-9)
    assert got["n_seen"].to_numpy().tolist() == list(range(1, 201))
