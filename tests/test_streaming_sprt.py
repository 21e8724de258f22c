"""Streaming SPRT (streaming/sprt.py): any chunking must reproduce the
batch operator's final row (6-dp contract), decisions freeze at the
first crossing, and the live Structured Streaming query agrees."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import sprt_bernoulli
from htm_streamer_spark.streaming.sprt import sprt_state_fn, streaming_sprt
from pyspark.sql import functions as F


class FakeState:
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


def _stream(p, n=400, seed=21, group="g"):
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "group": group,
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(n)],
            "flag": rng.uniform(size=n) < p,
        }
    )


def _batch_row(spark, pdf):
    df = spark.createDataFrame(pdf.assign(value=pdf["flag"].astype(float)))
    return (
        sprt_bernoulli(df, "group", "ts", F.col("value") > 0.5)
        .toPandas()
        .iloc[0]
    )


@pytest.mark.parametrize("chunks", [1, 4, 13])
@pytest.mark.parametrize("p", [0.25, 0.02, 0.13])
def test_chunked_equals_batch_final_row(spark, chunks, p):
    pdf = _stream(p)
    want = _batch_row(spark, pdf)
    fn = sprt_state_fn()
    state = FakeState()
    outs = []
    for chunk in np.array_split(pdf, chunks):
        outs.extend(fn(("g",), iter([chunk.reset_index(drop=True)]), state))
    last = outs[-1].iloc[0]
    assert int(last["n_rows"]) == int(want["n_rows"]) == 400
    assert int(last["n_flagged"]) == int(want["n_flagged"])
    assert last["llr_final"] == pytest.approx(want["llr_final"], abs=1e-9)
    assert last["decision"] == want["decision"]
    if want["decision"] != "continue":
        assert int(last["step_at"]) == int(want["step_at"])
        assert last["llr_at"] == pytest.approx(want["llr_at"], abs=1e-9)


def test_decision_freezes_at_first_crossing(spark):
    # elevated prefix crosses H1; a long clean suffix would cross H0 if
    # the test kept running — sequential semantics say it must not
    pdf = pd.concat(
        [
            _stream(0.9, n=60, seed=1),
            _stream(0.0, n=340, seed=2).assign(
                ts=lambda d: d["ts"] + pd.Timedelta(hours=2)
            ),
        ],
        ignore_index=True,
    )
    fn = sprt_state_fn()
    state = FakeState()
    outs = []
    for chunk in np.array_split(pdf, 5):
        outs.extend(fn(("g",), iter([chunk.reset_index(drop=True)]), state))
    first_decided = next(o.iloc[0] for o in outs if o.iloc[0]["decision"] != "continue")
    last = outs[-1].iloc[0]
    assert first_decided["decision"] == "accept_h1"
    assert last["decision"] == "accept_h1"  # frozen despite clean suffix
    assert int(last["step_at"]) == int(first_decided["step_at"])
    # and the batch twin agrees on the frozen decision
    want = _batch_row(spark, pdf)
    assert want["decision"] == "accept_h1"
    assert int(want["step_at"]) == int(last["step_at"])


def test_out_of_order_batch_raises(spark):
    pdf = _stream(0.1, n=20)
    fn = sprt_state_fn()
    state = FakeState()
    list(fn(("g",), iter([pdf.iloc[10:].reset_index(drop=True)]), state))
    with pytest.raises(ValueError, match="out-of-order"):
        list(fn(("g",), iter([pdf.iloc[:10].reset_index(drop=True)]), state))


def test_empty_micro_batch_keeps_state(spark):
    pdf = _stream(0.25, n=100)
    fn = sprt_state_fn()
    state = FakeState()
    outs = list(fn(("g",), iter([pdf]), state))
    before = state.get
    assert list(fn(("g",), iter([pdf.iloc[0:0]]), state)) == []
    assert state.get == before


def test_real_streaming_query_matches_batch(spark, tmp_path):
    pdf = _stream(0.25, n=300, seed=9)
    src = tmp_path / "src"
    src.mkdir()
    for i, c in enumerate(np.array_split(pdf, 3)):
        spark.createDataFrame(c.reset_index(drop=True)).coalesce(1).write.parquet(
            str(src / f"f{i}.parquet")
        )
    stream = (
        spark.readStream.schema("group string, ts timestamp, flag boolean")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out_dir = tmp_path / "out"
    q = (
        streaming_sprt(stream, "group")
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.read.parquet(str(out_dir))
        .orderBy(F.col("n_rows"))
        .toPandas()
        .iloc[-1]
    )
    want = _batch_row(spark, pdf)
    assert int(got["n_rows"]) == 300
    assert got["llr_final"] == pytest.approx(want["llr_final"], abs=1e-9)
    assert got["decision"] == want["decision"]
