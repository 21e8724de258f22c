"""Streaming KMV (streaming/kmv.py): the bottom-k sketch is order-free
and mergeable, so ANY chunking — including shuffled arrival order —
must reproduce the batch ``kmv_sketch`` row bit-exactly (integer
hashes, no float accumulation), and the live Structured Streaming
query must agree with the batch operator on the same files."""

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.kmv import kmv_sketch
from htm_streamer_spark.streaming.kmv import kmv_state_fn, streaming_kmv
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


def _events(n=3000, n_distinct=700, seed=5, group="g"):
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2024-03-01")
    items = rng.integers(0, n_distinct, size=n)
    return pd.DataFrame(
        {
            "group": group,
            "ts": [t0 + pd.Timedelta(seconds=int(i)) for i in range(n)],
            "item": [f"u{v}" for v in items],
        }
    )


def _hash_series(spark, pdf):
    """The Spark-side md5-60bit hashes for the items — what the
    streaming operator's select computes before the state fn."""
    df = spark.createDataFrame(pdf)
    h = F.conv(F.substring(F.md5(F.col("item").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    out = df.select("group", "ts", h.alias("h")).toPandas()
    return out


def _batch_row(spark, pdf, k=256):
    df = spark.createDataFrame(pdf)
    return kmv_sketch(df, "group", "item", k=k).toPandas().iloc[0]


@pytest.mark.parametrize("chunks", [1, 3, 11])
@pytest.mark.parametrize("order", ["arrival", "shuffled", "reversed"])
def test_chunked_equals_batch_sketch(spark, chunks, order):
    pdf = _events()
    want = _batch_row(spark, pdf)
    hashed = _hash_series(spark, pdf)
    if order == "shuffled":
        hashed = hashed.sample(frac=1.0, random_state=7).reset_index(drop=True)
    elif order == "reversed":
        hashed = hashed.iloc[::-1].reset_index(drop=True)
    fn = kmv_state_fn(k=256)
    state = FakeState()
    outs = []
    for chunk in np.array_split(hashed, chunks):
        outs.extend(fn(("g",), iter([chunk.reset_index(drop=True)]), state))
    last = outs[-1].iloc[0]
    assert int(last["n_seen"]) == len(pdf)
    assert int(last["n_kept"]) == int(want["n_kept"]) == 256
    assert last["kth_u"] == pytest.approx(want["kth_u"], abs=1e-12)
    assert last["est_distinct"] == pytest.approx(want["est_distinct"], abs=1e-9)


def test_small_group_exact_below_k(spark):
    # fewer than k distinct items → the sketch IS the distinct set and
    # the estimate is exact
    pdf = _events(n=500, n_distinct=40)
    hashed = _hash_series(spark, pdf)
    fn = kmv_state_fn(k=256)
    state = FakeState()
    outs = []
    for chunk in np.array_split(hashed, 4):
        outs.extend(fn(("g",), iter([chunk.reset_index(drop=True)]), state))
    last = outs[-1].iloc[0]
    assert int(last["n_kept"]) == 40
    assert last["est_distinct"] == 40.0


def test_duplicates_are_idempotent(spark):
    # feeding the same micro-batch twice must not change the signature
    # (set semantics) — only n_seen moves
    pdf = _events(n=800, n_distinct=300)
    hashed = _hash_series(spark, pdf)
    fn = kmv_state_fn(k=256)
    state = FakeState()
    list(fn(("g",), iter([hashed]), state))
    sig_once, seen_once = state.get
    out2 = list(fn(("g",), iter([hashed]), state))[-1].iloc[0]
    sig_twice, seen_twice = state.get
    assert sig_twice == sig_once
    assert seen_twice == 2 * seen_once
    want = _batch_row(spark, pdf)
    assert out2["est_distinct"] == pytest.approx(want["est_distinct"], abs=1e-9)


def test_empty_micro_batch_keeps_state(spark):
    hashed = _hash_series(spark, _events(n=300))
    fn = kmv_state_fn(k=256)
    state = FakeState()
    list(fn(("g",), iter([hashed]), state))
    before = state.get
    assert list(fn(("g",), iter([hashed.iloc[0:0]]), state)) == []
    assert state.get == before


def test_real_streaming_query_matches_batch(spark, tmp_path):
    pdf = pd.concat(
        [
            _events(n=1200, n_distinct=500, seed=1, group="a"),
            _events(n=900, n_distinct=150, seed=2, group="b"),
        ],
        ignore_index=True,
    )
    src = tmp_path / "src"
    src.mkdir()
    for i, c in enumerate(np.array_split(pdf, 3)):
        spark.createDataFrame(c.reset_index(drop=True)).coalesce(1).write.parquet(
            str(src / f"f{i}.parquet")
        )
    stream = (
        spark.readStream.schema("group string, ts timestamp, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out_dir = tmp_path / "out"
    q = (
        streaming_kmv(stream, "group", "item", k=128)
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
        .orderBy("group", "n_seen")
        .toPandas()
        .groupby("group")
        .last()
    )
    want = (
        kmv_sketch(spark.createDataFrame(pdf), "group", "item", k=128)
        .toPandas()
        .set_index("group")
    )
    for g in ("a", "b"):
        assert int(got.loc[g, "n_seen"]) == len(pdf[pdf["group"] == g])
        assert int(got.loc[g, "n_kept"]) == int(want.loc[g, "n_kept"])
        assert got.loc[g, "est_distinct"] == pytest.approx(
            want.loc[g, "est_distinct"], abs=1e-9
        )
