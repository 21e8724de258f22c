"""Streaming SPRT monitor — Wald's sequential test as a Structured
Streaming stateful operator on the new-generation arbitrary-state API
(``transformWithStateInPandas``), with a thin compat adapter for the
older ``applyInPandasWithState`` path.

The batch twin (operators/stattests.py:sprt_bernoulli) replays a whole
ordered stream and reports the first boundary crossing; SPRT's whole
point, though, is ONLINE decision-making — stop the moment the
evidence suffices. Here the running log-likelihood ratio lives in the
state store (two counters + two doubles per key — bounded by
construction), each micro-batch advances it, and the emitted row per
(key, micro-batch) carries the running totals plus the decision,
FROZEN at its first crossing exactly like the batch operator
(sequential semantics: later reversals don't count). Feeding the same
rows in any chunking yields the batch operator's final row — pinned by
tests to the 6-dp contract.

Both API wirings share ONE pure kernel (``make_sprt_kernel``), so
their semantics cannot drift: the kernel is what the chunking-
invariance tests pin. The new API additionally offers state TTL
(``ttl_ms``) — on an unbounded key domain, a test that never concludes
for a key that went quiet is evicted by the state store itself instead
of leaking forever (same motivation as streaming/tws.py).

Ordering contract: same as streaming/stateful.py — a group's
micro-batch arrives as several Arrow chunks in arbitrary order, so the
batch is materialized and sorted by (ts, *order_cols) ONCE, and a
micro-batch that starts before the last processed ts raises (route
late data through an upstream watermark + sort).

Sandbox note: LIVE transformWithState execution needs the RocksDB
state store provider AND the ``protobuf`` package for the worker's
state-server protocol — absent in this container, so the live
new-API test auto-skips while the old-API adapter runs live (same
pattern as streaming/tws.py).

Reference analog: the reference's stream runner re-scores per row with
state on the filesystem (htm_streamer/pipeline/htm_stream_runner.py);
this is the same shape with Spark's state store holding four scalars.
"""

from __future__ import annotations

from math import log
from typing import Iterator

import numpy as np
import pandas as pd

STATE_SCHEMA = (
    "n long, k long, llr double, decision string, step_at long, "
    "llr_at double, last_ts_us long"
)
OUTPUT_SCHEMA = (
    "group string, ts_last timestamp, n_rows long, n_flagged long, "
    "llr_final double, decision string, step_at long, llr_at double"
)

EMPTY_STATE = (0, 0, 0.0, None, None, None, None)


def make_sprt_kernel(
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    order_cols: tuple = (),
):
    """Pure kernel factory: ``kernel(key, state_tuple|None, pdf) ->
    (new_state_tuple, out_pdf|None)``. The closure holds all numerics,
    so executors need nothing on PYTHONPATH; both streaming APIs and
    the unit tests drive this one function."""
    la = log((1.0 - beta) / alpha)
    lb = log(beta / (1.0 - alpha))
    wp = log(p1 / p0)
    wn = log((1.0 - p1) / (1.0 - p0))

    def _r6(x):
        return round(x + 1e-9, 6) if x is not None else None

    def kernel(key_str, state, batch):
        n, k, llr, decision, step_at, llr_at, last_ts_us = (
            state if state is not None else EMPTY_STATE
        )
        decision = decision or None
        if not len(batch):
            return (n, k, llr, decision, step_at, llr_at, last_ts_us), None
        batch = batch.sort_values(
            ["ts", *order_cols], kind="mergesort"
        ).reset_index(drop=True)

        batch_min_us = int(batch["ts"].iloc[0].value) // 1000
        if last_ts_us is not None and batch_min_us < last_ts_us:
            raise ValueError(
                f"out-of-order micro-batch for key {key_str!r}: batch min ts "
                f"{batch['ts'].iloc[0]} precedes last processed ts "
                f"{pd.Timestamp(last_ts_us * 1000)}; add an upstream "
                "watermark + sort before the stateful operator"
            )
        last_ts_us = int(batch["ts"].iloc[-1].value) // 1000

        flags = batch["flag"].to_numpy(dtype=bool)
        incr = np.where(flags, wp, wn)
        path = llr + np.cumsum(incr)
        if decision is None:
            hit_h1 = path >= la
            hit_h0 = path <= lb
            hits = hit_h1 | hit_h0
            if hits.any():
                i = int(np.argmax(hits))  # first crossing in this batch
                decision = "accept_h1" if hit_h1[i] else "accept_h0"
                step_at = n + i + 1
                llr_at = float(path[i])
        llr = float(path[-1])
        n += len(batch)
        k += int(flags.sum())

        out = pd.DataFrame(
            {
                "group": [key_str],
                "ts_last": [batch["ts"].iloc[-1]],
                "n_rows": [n],
                "n_flagged": [k],
                "llr_final": [_r6(llr)],
                "decision": [decision or "continue"],
                "step_at": [step_at],
                "llr_at": [_r6(llr_at) if llr_at is not None else None],
            }
        )
        return (n, k, llr, decision, step_at, llr_at, last_ts_us), out

    return kernel


def _pack(state):
    """kernel tuple -> state-store row (decision None -> '')."""
    n, k, llr, decision, step_at, llr_at, last_ts_us = state
    return (n, k, llr, decision or "", step_at, llr_at, last_ts_us)


def sprt_state_fn(
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    order_cols: tuple = (),
):
    """applyInPandasWithState adapter over :func:`make_sprt_kernel` —
    the compat path this container can execute LIVE (the new-API
    worker protocol needs protobuf; see module docstring)."""
    kernel = make_sprt_kernel(p0, p1, alpha, beta, order_cols)

    def fn(key, pdf_iter, state):
        prior = tuple(state.get) if state.exists else None
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        batch = (
            parts[0]
            if len(parts) == 1
            else pd.concat(parts, ignore_index=True)
            if parts
            else pd.DataFrame({"ts": [], "flag": []})
        )
        new_state, out = kernel(key[0], prior, batch)
        state.update(_pack(new_state))
        return iter([out]) if out is not None else iter([])

    return fn


try:  # the class is importable even where the new API's deps are absent
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
except ImportError:  # pragma: no cover - pyspark always ships the module
    StatefulProcessor = object
    StatefulProcessorHandle = object


class SprtProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: one ValueState row per key
    (the 7-field SPRT tuple), optionally TTL-evicted after ``ttl_ms``
    idle — the bounded-state property for keys that go quiet before
    the test concludes."""

    def __init__(
        self,
        p0: float = 0.10,
        p1: float = 0.20,
        alpha: float = 0.05,
        beta: float = 0.05,
        order_cols: tuple = (),
        ttl_ms: int | None = None,
    ):
        self._kernel_args = (p0, p1, alpha, beta, tuple(order_cols))
        self._ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "sprt", STATE_SCHEMA, ttlDurationMs=self._ttl_ms
        )
        self._kernel = make_sprt_kernel(*self._kernel_args)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(rows), ignore_index=True)
        prior = tuple(self._state.get()) if self._state.exists() else None
        new_state, out = self._kernel(key[0], prior, pdf)
        self._state.update(_pack(new_state))
        if out is not None:
            yield out

    def close(self) -> None:
        pass


def streaming_sprt(
    stream_df,
    group_col: str,
    *,
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    order_cols: tuple = (),
    use_tws: bool = False,
    ttl_ms: int | None = None,
):
    """Wire the SPRT monitor onto a (streaming or batch-groupable)
    DataFrame carrying columns (``group_col``, ts, flag boolean,
    *order_cols). Emits one row per (key, micro-batch) — append
    semantics (each snapshot is final once emitted, never revised), so
    any append-mode sink works; the latest row per key is the current
    verdict.

    ``use_tws=True`` runs on transformWithStateInPandas (state TTL
    available via ``ttl_ms``); the default runs the compat
    applyInPandasWithState path — identical semantics, one kernel.
    """
    from pyspark.sql import functions as F

    named = stream_df.select(
        F.col(group_col).alias("group"), "ts", "flag", *order_cols
    )
    if use_tws:
        return named.groupBy("group").transformWithStateInPandas(
            statefulProcessor=SprtProcessor(
                p0=p0, p1=p1, alpha=alpha, beta=beta,
                order_cols=order_cols, ttl_ms=ttl_ms,
            ),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="ProcessingTime",
        )
    fn = sprt_state_fn(p0=p0, p1=p1, alpha=alpha, beta=beta, order_cols=order_cols)
    return named.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
