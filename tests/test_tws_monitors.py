"""SPRT / KMV / CMS monitors on the transformWithStateInPandas API
(streaming/{sprt,kmv,cms}.py *Processor classes).

Both API wirings share one pure kernel per monitor, so the invariance
tests here drive the NEW path's handleInputRows directly (fake state
handle) and assert it reproduces (a) the old-API adapter's output and
(b) the batch twin — the same chunking contract the old-API tests pin.
The live transformWithState query needs protobuf + RocksDB provider
(absent in this container), so live coverage stays on the old-API
adapter (tests/test_streaming_*.py) and the new-API live test
auto-skips, exactly like tests/test_tws.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.streaming.cms import CmsProcessor, cms_state_fn
from htm_streamer_spark.streaming.kmv import KmvProcessor, kmv_state_fn
from htm_streamer_spark.streaming.sprt import SprtProcessor, sprt_state_fn


class FakeValueState:
    """New-API ValueState surface: exists()/get()/update() METHODS
    (the old API exposes exists/get as properties)."""

    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class FakeHandle:
    def __init__(self):
        self.states = {}
        self.ttls = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        self.ttls[name] = ttlDurationMs
        return self.states.setdefault(name, FakeValueState())


class OldFakeState:
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


def _drive_new(proc, pdf, chunks, key=("g",)):
    h = FakeHandle()
    proc.init(h)
    outs = []
    for c in np.array_split(pdf, chunks):
        outs.extend(proc.handleInputRows(key, iter([c.reset_index(drop=True)]), None))
    return outs


def _drive_old(fn, pdf, chunks, key=("g",)):
    state = OldFakeState()
    outs = []
    for c in np.array_split(pdf, chunks):
        outs.extend(fn(key, iter([c.reset_index(drop=True)]), state))
    return outs


def _sprt_stream(p, n=400, seed=21):
    rng = np.random.default_rng(seed)
    t0 = pd.Timestamp("2024-01-01")
    return pd.DataFrame(
        {
            "group": "g",
            "ts": [t0 + pd.Timedelta(minutes=i) for i in range(n)],
            "flag": rng.uniform(size=n) < p,
        }
    )


@pytest.mark.parametrize("chunks", [1, 4, 13])
@pytest.mark.parametrize("p", [0.25, 0.02, 0.13])
def test_sprt_processor_equals_old_adapter(chunks, p):
    pdf = _sprt_stream(p)
    new = _drive_new(SprtProcessor(), pdf, chunks)
    old = _drive_old(sprt_state_fn(), pdf, chunks)
    assert len(new) == len(old) == chunks
    pd.testing.assert_frame_equal(
        pd.concat(new, ignore_index=True), pd.concat(old, ignore_index=True)
    )


def test_sprt_processor_out_of_order_raises():
    pdf = _sprt_stream(0.1, n=20)
    proc = SprtProcessor()
    h = FakeHandle()
    proc.init(h)
    list(proc.handleInputRows(("g",), iter([pdf.iloc[10:].reset_index(drop=True)]), None))
    with pytest.raises(ValueError, match="out-of-order"):
        list(proc.handleInputRows(("g",), iter([pdf.iloc[:10].reset_index(drop=True)]), None))


def test_sprt_processor_ttl_plumbed():
    proc = SprtProcessor(ttl_ms=60_000)
    h = FakeHandle()
    proc.init(h)
    assert h.ttls == {"sprt": 60_000}


def _kmv_stream(n=3000, seed=5, dup_every=3):
    rng = np.random.default_rng(seed)
    items = rng.integers(0, n // dup_every, size=n)
    # same md5-60bit convention as the Spark-side expression
    import hashlib

    hs = [
        int(hashlib.md5(str(int(i)).encode()).hexdigest()[:15], 16)
        for i in items
    ]
    return pd.DataFrame(
        {
            "group": "g",
            "ts": pd.date_range("2025-05-01", periods=n, freq="s"),
            "h": np.asarray(hs, dtype=np.int64),
        }
    )


@pytest.mark.parametrize("chunks", [1, 7, 20])
def test_kmv_processor_equals_old_adapter(chunks):
    pdf = _kmv_stream()
    new = _drive_new(KmvProcessor(k=64), pdf, chunks)
    old = _drive_old(kmv_state_fn(k=64), pdf, chunks)
    assert len(new) == len(old) == chunks
    pd.testing.assert_frame_equal(
        pd.concat(new, ignore_index=True), pd.concat(old, ignore_index=True)
    )
    # final estimate is chunking-invariant: last rows agree across chunkings
    one = _drive_new(KmvProcessor(k=64), pdf, 1)[-1].iloc[-1]
    many = new[-1].iloc[-1]
    assert one["est_distinct"] == many["est_distinct"]
    assert one["n_kept"] == many["n_kept"]


def _cms_stream(n=2000, seed=7, d=4, w=64):
    rng = np.random.default_rng(seed)
    items = rng.zipf(1.5, size=n) % 100
    import hashlib

    rows = {"group": "g", "item": items.astype(str), "wt": np.ones(n, dtype=np.int64)}
    for i in range(d):
        rows[f"p{i}"] = np.asarray(
            [
                int(hashlib.md5(f"cms{i}:{it}".encode()).hexdigest()[:15], 16) % w
                for it in rows["item"]
            ],
            dtype=np.int64,
        )
    return pd.DataFrame(rows)


@pytest.mark.parametrize("chunks", [1, 6, 15])
def test_cms_processor_equals_old_adapter(chunks):
    pdf = _cms_stream()
    new = _drive_new(CmsProcessor(d=4, w=64), pdf, chunks)
    old = _drive_old(cms_state_fn(d=4, w=64), pdf, chunks)
    pd.testing.assert_frame_equal(
        pd.concat(new, ignore_index=True), pd.concat(old, ignore_index=True)
    )
    # weight-0 probe through the NEW path reads without writing
    probe = pdf.drop_duplicates(subset=["item"]).assign(wt=0)
    proc = CmsProcessor(d=4, w=64)
    h = FakeHandle()
    proc.init(h)
    list(proc.handleInputRows(("g",), iter([pdf]), None))
    before = tuple(h.states["cms"].get())
    out = list(proc.handleInputRows(("g",), iter([probe]), None))
    after = tuple(h.states["cms"].get())
    assert np.array_equal(np.asarray(before[0]), np.asarray(after[0]))
    assert before[1] == after[1]
    # probe estimates equal the post-ingest batch estimates
    got = out[0].set_index("item")["est"].to_dict()
    want_rows = _drive_new(CmsProcessor(d=4, w=64), pdf, 1)[-1]
    want = want_rows.set_index("item")["est"].to_dict()
    for item, est in want.items():
        assert got[item] == est


def test_live_tws_sprt_matches_batch(spark, tmp_path):
    # Live transformWithState needs protobuf (worker state-server
    # protocol) and the RocksDB state-store provider; skip where absent.
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state-server protocol needs protobuf",
    )
    from htm_streamer_spark.streaming.sprt import streaming_sprt

    pdf = _sprt_stream(0.25, n=300, seed=9)
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
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    q = (
        streaming_sprt(stream, "group", use_tws=True)
        .writeStream.format("parquet")
        .option("path", str(out_dir))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(str(out_dir)).orderBy("n_rows").toPandas()
    assert int(got["n_rows"].iloc[-1]) == 300
