"""Streaming Count-Min frequency monitor — the CMS as a Structured
Streaming stateful operator on the new-generation arbitrary-state API
(``transformWithStateInPandas``), with a thin compat adapter for the
older ``applyInPandasWithState`` path.

Exact streaming frequency tracking needs state proportional to the
distinct-item domain — unbounded. The CMS state row is d·w int64
counters per key: FIXED-SIZE, ADDITIVE (state + batch histogram —
sketches of slices merge by summing cells), and therefore ORDER-FREE
like the KMV monitor: arrival order and micro-batch chunking cannot
change the final counters, and any chunking reproduces the batch
``cms_sketch`` cells exactly (integer adds — no float accumulation).
Contrast the path-dependent likelihood/SPRT tiers, which need the
monotone-ts guard; a counter array needs none.

Both API wirings share ONE pure kernel (``cms_chunk``), so their
semantics cannot drift. The new API additionally offers state TTL
(``ttl_ms``) — bounded total state on an unbounded key domain (same
motivation as streaming/tws.py).

Each micro-batch emits the current estimate for the distinct items IN
that batch (output stays batch-sized, never domain-sized). Rows carry
a weight column; weight-0 rows PROBE without writing — how a caller
reads estimates for a chosen item set from the live query without
perturbing it (tests pin that a weight-0 probe batch reproduces the
batch-operator estimates bit-exactly).

Positions are computed Spark-side by the SAME md5-60bit expressions as
the batch operator (``operators/cms.py``), so stream, batch, and the
DuckDB oracle share one hash construction; the Python stage only adds
integers into a numpy array.

Sandbox note: LIVE transformWithState needs the RocksDB state store
provider and the ``protobuf`` package — absent in this container, so
the live new-API test auto-skips while the old-API adapter runs live.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

STATE_SCHEMA = "cells array<long>, n_seen long"
OUTPUT_SCHEMA = "group string, item string, est long, n_seen long"


def cms_chunk(state, batch: pd.DataFrame, d: int = 4, w: int = 256, threshold: int = 0):
    """Pure kernel: fold one micro-batch (columns item, wt, p0..p{d-1})
    into the (cells:int64[d*w], n_seen) state; return
    (new_state, out_pdf_cols|None). Chunking-invariant by counter
    additivity."""
    if state is not None:
        cells_list, n_seen = state
        cells = np.asarray(cells_list, dtype=np.int64)
    else:
        cells, n_seen = np.zeros(d * w, dtype=np.int64), 0
    if not len(batch):
        return (cells, n_seen), None
    wt = batch["wt"].to_numpy(dtype=np.int64)
    for i in range(d):
        np.add.at(cells, i * w + batch[f"p{i}"].to_numpy(dtype=np.int64), wt)
    n_seen += int(wt.sum())

    dd = batch.drop_duplicates(subset=["item"])
    est = np.min(
        np.stack(
            [cells[i * w + dd[f"p{i}"].to_numpy(dtype=np.int64)] for i in range(d)]
        ),
        axis=0,
    )
    out = pd.DataFrame({"item": dd["item"].to_numpy(), "est": est, "n_seen": n_seen})
    out = out[out["est"] >= threshold]
    return (cells, n_seen), (out if len(out) else None)


def cms_state_fn(d: int = 4, w: int = 256, threshold: int = 0):
    """applyInPandasWithState adapter over :func:`cms_chunk` — the
    compat path this container can execute LIVE."""

    def fn(key, pdf_iter, state):
        prior = tuple(state.get) if state.exists else None
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        batch = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"item": [], "wt": []})
        )
        (cells, n_seen), out = cms_chunk(prior, batch, d=d, w=w, threshold=threshold)
        state.update((cells.tolist(), n_seen))
        if out is None:
            return iter([])
        out = out.copy()
        out.insert(0, "group", key[0])
        return iter([out])

    return fn


try:
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover
    StatefulProcessor = object
    StatefulProcessorHandle = object


class CmsProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: one ValueState row per key
    (d·w counters + count), TTL-evicted after ``ttl_ms``."""

    def __init__(self, d: int = 4, w: int = 256, threshold: int = 0, ttl_ms: int | None = None):
        self._d, self._w, self._threshold = d, w, threshold
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "cms", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        prior = tuple(self._state.get()) if self._state.exists() else None
        (cells, n_seen), out = cms_chunk(
            prior, pdf, d=self._d, w=self._w, threshold=self._threshold
        )
        self._state.update((cells.tolist(), n_seen))
        if out is not None:
            out = out.copy()
            out.insert(0, "group", key[0])
            yield out

    def close(self) -> None:
        pass


def streaming_cms(
    stream_df,
    group_col: str,
    item_col: str,
    d: int = 4,
    w: int = 256,
    count_col: str | None = None,
    threshold: int = 0,
    *,
    use_tws: bool = False,
    ttl_ms: int | None = None,
):
    """Wire the CMS monitor onto a (streaming or batch-groupable)
    DataFrame carrying (``group_col``, ``item_col``[, ``count_col``]).
    Emits (group, item, est, n_seen) per distinct item per micro-batch
    — append semantics; estimates only ever grow, and the latest row
    per item is current. ``threshold`` turns the monitor into a
    heavy-hitter alarm (emit only items whose estimate crossed it).

    ``use_tws=True`` runs on transformWithStateInPandas (state TTL
    available via ``ttl_ms``); the default runs the compat
    applyInPandasWithState path — identical semantics, one kernel."""
    from pyspark.sql import functions as F

    from htm_streamer_spark.operators.cms import cms_positions

    pos = cms_positions(F.col(item_col), d, w)
    wgt = F.col(count_col).cast("long") if count_col else F.lit(1).cast("long")
    named = stream_df.select(
        F.col(group_col).cast("string").alias("group"),
        F.col(item_col).cast("string").alias("item"),
        wgt.alias("wt"),
        *[p.alias(f"p{i}") for i, p in enumerate(pos)],
    )
    if use_tws:
        return named.groupBy("group").transformWithStateInPandas(
            statefulProcessor=CmsProcessor(d=d, w=w, threshold=threshold, ttl_ms=ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="ProcessingTime",
        )
    fn = cms_state_fn(d=d, w=w, threshold=threshold)
    return named.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
