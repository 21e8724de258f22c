"""Streaming KMV distinct-count monitor — the bottom-k sketch as a
Structured Streaming stateful operator on the new-generation
arbitrary-state API (``transformWithStateInPandas``), with a thin
compat adapter for the older ``applyInPandasWithState`` path.

Exact streaming distinct counting needs state proportional to the
distinct count itself — unbounded on an unbounded stream. The KMV
sketch (operators/kmv.py) is the bounded-state answer: the k smallest
item hashes per key are (a) a fixed-size state row, (b) MERGEABLE
(bottom-k of a union = bottom-k of the concatenated signatures — so
micro-batch arrival order and chunking are irrelevant), and (c) an
unbiased distinct estimator D̂ = (k−1)/u_(k). Any chunking reproduces
the batch ``kmv_sketch`` output EXACTLY (integer hashes — no float
accumulation), pinned by tests.

Both API wirings share ONE pure kernel (``kmv_chunk``), so their
semantics cannot drift. The new API additionally offers state TTL
(``ttl_ms``): on an unbounded key domain the state store itself
evicts sketches for keys idle longer than the TTL — the property that
keeps total state bounded on a 100-TB/day stream where most keys go
quiet (same motivation as streaming/tws.py).

Unlike the path-dependent stateful operators (likelihood, SPRT), a set
sketch is ORDER-FREE: late or out-of-order rows cannot corrupt it, so
there is no monotone-ts guard here — a duplicate arriving after any
delay is absorbed idempotently. The item hash is computed Spark-side
(the md5-60bit codegen expression shared with the batch operator and
the DuckDB oracle); the Python stage only merges sorted integer
arrays.

Sandbox note: LIVE transformWithState needs the RocksDB state store
provider and the ``protobuf`` package — absent in this container, so
the live new-API test auto-skips while the old-API adapter runs live.

Reference analog: the reference keeps running per-feature stats in
model state (htm_streamer/model/runner.py); this is the same
keep-a-small-summary shape with the summary being a provable synopsis.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

STATE_SCHEMA = "sig array<long>, n_seen long"
OUTPUT_SCHEMA = (
    "group string, ts_last timestamp, n_seen long, n_kept long, "
    "kth_u double, est_distinct double"
)

HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)


def kmv_chunk(state, batch: pd.DataFrame, k: int = 256):
    """Pure kernel: fold one micro-batch (columns ts, h) into the
    (sig:int64[], n_seen) state; return (new_state, out_pdf|None).
    Chunking-invariant by the mergeability of bottom-k."""
    if state is not None:
        sig_list, n_seen = state
        sig = np.asarray(sig_list, dtype=np.int64)
    else:
        sig, n_seen = np.empty(0, dtype=np.int64), 0
    if not len(batch):
        return (sig, n_seen), None
    hs = batch["h"].to_numpy(dtype=np.int64)
    # bottom-k of (state ∪ batch): union1d sorts and dedups
    sig = np.union1d(sig, hs)[:k]
    n_seen += len(batch)

    n_kept = int(len(sig))
    kth_u = (float(sig[-1]) + 1.0) / HASH_SPACE if n_kept else None
    if n_kept == 0:
        est = None
    elif n_kept < k:
        est = float(n_kept)
    else:
        est = (k - 1) / kth_u
    r = lambda x: round(x + 1e-9, 6) if x is not None else None  # noqa: E731
    out_cols = {
        "ts_last": [batch["ts"].max()],
        "n_seen": [n_seen],
        "n_kept": [n_kept],
        "kth_u": [round(kth_u + 1e-9, 9) if kth_u else None],
        "est_distinct": [r(est)],
    }
    return (sig, n_seen), out_cols


def kmv_state_fn(k: int = 256):
    """applyInPandasWithState adapter over :func:`kmv_chunk` — the
    compat path this container can execute LIVE."""

    def fn(key, pdf_iter, state):
        prior = tuple(state.get) if state.exists else None
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        batch = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"ts": [], "h": []})
        )
        (sig, n_seen), out_cols = kmv_chunk(prior, batch, k=k)
        state.update((sig.tolist(), n_seen))
        if out_cols is None:
            return iter([])
        return iter([pd.DataFrame({"group": [key[0]], **out_cols})])

    return fn


try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover
    StatefulProcessor = object
    StatefulProcessorHandle = object


class KmvProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: one ValueState row per key
    (the ≤k-long signature + count), TTL-evicted after ``ttl_ms``."""

    def __init__(self, k: int = 256, ttl_ms: int | None = None):
        self._k = k
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "kmv", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        prior = tuple(self._state.get()) if self._state.exists() else None
        (sig, n_seen), out_cols = kmv_chunk(prior, pdf, k=self._k)
        self._state.update((sig.tolist(), n_seen))
        if out_cols is not None:
            yield pd.DataFrame({"group": [key[0]], **out_cols})

    def close(self) -> None:
        pass


def streaming_kmv(
    stream_df,
    group_col: str,
    item_col: str,
    k: int = 256,
    *,
    use_tws: bool = False,
    ttl_ms: int | None = None,
):
    """Wire the KMV monitor onto a (streaming or batch-groupable)
    DataFrame carrying (``group_col``, ts, ``item_col``). One row per
    (key, micro-batch) — append semantics (each snapshot is final once
    emitted; the latest row per key is the current estimate). The
    md5-60bit hash runs Spark-side so the sketch is bit-identical to
    the batch operator and its oracle.

    ``use_tws=True`` runs on transformWithStateInPandas (state TTL
    available via ``ttl_ms``); the default runs the compat
    applyInPandasWithState path — identical semantics, one kernel."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    named = stream_df.select(F.col(group_col).alias("group"), "ts", h.alias("h"))
    if use_tws:
        return named.groupBy("group").transformWithStateInPandas(
            statefulProcessor=KmvProcessor(k=k, ttl_ms=ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="ProcessingTime",
        )
    fn = kmv_state_fn(k=k)
    return named.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
