"""Streaming SPRT monitor — Wald's sequential test as a true
Structured Streaming stateful operator (``applyInPandasWithState``).

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

Ordering contract: same as streaming/stateful.py — a group's
micro-batch arrives as several Arrow chunks in arbitrary order, so the
batch is materialized and sorted by (ts, *order_cols) ONCE, and a
micro-batch that starts before the last processed ts raises (route
late data through an upstream watermark + sort).

Reference analog: the reference's stream runner re-scores per row with
state on the filesystem (htm_streamer/pipeline/htm_stream_runner.py);
this is the same shape with Spark's state store holding four scalars.
"""

from __future__ import annotations

from math import log

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


def sprt_state_fn(
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    order_cols: tuple = (),
):
    """Factory for the applyInPandasWithState function (closure holds
    all numerics — executors need no package on PYTHONPATH)."""
    la = log((1.0 - beta) / alpha)
    lb = log(beta / (1.0 - alpha))
    wp = log(p1 / p0)
    wn = log((1.0 - p1) / (1.0 - p0))

    def _r6(x):
        return round(x + 1e-9, 6) if x is not None else None

    def fn(key, pdf_iter, state):
        if state.exists:
            n, k, llr, decision, step_at, llr_at, last_ts_us = state.get
            decision = decision or None
        else:
            n, k, llr, decision, step_at, llr_at, last_ts_us = (
                0, 0, 0.0, None, None, None, None,
            )

        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if not parts:
            # empty micro-batch: keep state, emit nothing
            state.update((n, k, llr, decision or "", step_at, llr_at, last_ts_us))
            return iter([])
        batch = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        batch = batch.sort_values(
            ["ts", *order_cols], kind="mergesort"
        ).reset_index(drop=True)

        batch_min_us = int(batch["ts"].iloc[0].value) // 1000
        if last_ts_us is not None and batch_min_us < last_ts_us:
            raise ValueError(
                f"out-of-order micro-batch for key {key[0]!r}: batch min ts "
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

        state.update((n, k, llr, decision or "", step_at, llr_at, last_ts_us))
        return iter(
            [
                pd.DataFrame(
                    {
                        "group": [key[0]],
                        "ts_last": [batch["ts"].iloc[-1]],
                        "n_rows": [n],
                        "n_flagged": [k],
                        "llr_final": [_r6(llr)],
                        "decision": [decision or "continue"],
                        "step_at": [step_at],
                        "llr_at": [_r6(llr_at) if llr_at is not None else None],
                    }
                )
            ]
        )

    return fn


def streaming_sprt(
    stream_df,
    group_col: str,
    *,
    p0: float = 0.10,
    p1: float = 0.20,
    alpha: float = 0.05,
    beta: float = 0.05,
    order_cols: tuple = (),
):
    """Wire the SPRT state fn onto a (streaming or batch-groupable)
    DataFrame carrying columns (``group_col``, ts, flag boolean,
    *order_cols). Emits one row per (key, micro-batch) — append
    semantics (each snapshot is final once emitted, never revised), so
    any append-mode sink works; the latest row per key is the current
    verdict.
    """
    from pyspark.sql import functions as F

    fn = sprt_state_fn(p0=p0, p1=p1, alpha=alpha, beta=beta, order_cols=order_cols)
    return (
        stream_df.select(
            F.col(group_col).alias("group"), "ts", "flag", *order_cols
        )
        .groupBy("group")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
