"""Streaming KMV distinct-count monitor — the bottom-k sketch as a
Structured Streaming stateful operator (``applyInPandasWithState``).

Exact streaming distinct counting needs state proportional to the
distinct count itself — unbounded on an unbounded stream. The KMV
sketch (operators/kmv.py) is the bounded-state answer: the k smallest
item hashes per key are (a) a fixed-size state row, (b) MERGEABLE
(bottom-k of a union = bottom-k of the concatenated signatures — so
micro-batch arrival order and chunking are irrelevant), and (c) an
unbiased distinct estimator D̂ = (k−1)/u_(k). Any chunking reproduces
the batch ``kmv_sketch`` output EXACTLY (integer hashes — no float
accumulation), pinned by tests.

Unlike the path-dependent stateful operators (likelihood, SPRT), a set
sketch is ORDER-FREE: late or out-of-order rows cannot corrupt it, so
there is no monotone-ts guard here — a duplicate arriving after any
delay is absorbed idempotently. The item hash is computed Spark-side
(the md5-60bit codegen expression shared with the batch operator and
the DuckDB oracle); the Python stage only merges sorted integer
arrays.

Reference analog: the reference keeps running per-feature stats in
model state (htm_streamer/model/runner.py); this is the same
keep-a-small-summary shape with the summary being a provable synopsis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STATE_SCHEMA = "sig array<long>, n_seen long"
OUTPUT_SCHEMA = (
    "group string, ts_last timestamp, n_seen long, n_kept long, "
    "kth_u double, est_distinct double"
)

HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)


def kmv_state_fn(k: int = 256):
    """Factory for the applyInPandasWithState function (closure holds
    k — executors need no package on PYTHONPATH)."""

    def fn(key, pdf_iter, state):
        if state.exists:
            sig_list, n_seen = state.get
            sig = np.asarray(sig_list, dtype=np.int64)
        else:
            sig, n_seen = np.empty(0, dtype=np.int64), 0

        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if not parts:
            state.update((sig.tolist(), n_seen))
            return iter([])
        batch = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        hs = batch["h"].to_numpy(dtype=np.int64)
        # bottom-k of (state ∪ batch): union1d sorts and dedups
        sig = np.union1d(sig, hs)[:k]
        n_seen += len(batch)
        state.update((sig.tolist(), n_seen))

        n_kept = int(len(sig))
        kth_u = (float(sig[-1]) + 1.0) / HASH_SPACE if n_kept else None
        if n_kept == 0:
            est = None
        elif n_kept < k:
            est = float(n_kept)
        else:
            est = (k - 1) / kth_u
        r = lambda x: round(x + 1e-9, 6) if x is not None else None  # noqa: E731
        return iter(
            [
                pd.DataFrame(
                    {
                        "group": [key[0]],
                        "ts_last": [batch["ts"].max()],
                        "n_seen": [n_seen],
                        "n_kept": [n_kept],
                        "kth_u": [round(kth_u + 1e-9, 9) if kth_u else None],
                        "est_distinct": [r(est)],
                    }
                )
            ]
        )

    return fn


def streaming_kmv(
    stream_df,
    group_col: str,
    item_col: str,
    k: int = 256,
):
    """Wire the KMV state fn onto a (streaming or batch-groupable)
    DataFrame carrying (``group_col``, ts, ``item_col``). One row per
    (key, micro-batch) — append semantics (each snapshot is final once
    emitted; the latest row per key is the current estimate). The
    md5-60bit hash runs Spark-side so the sketch is bit-identical to
    the batch operator and its oracle."""
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col(item_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    fn = kmv_state_fn(k=k)
    return (
        stream_df.select(F.col(group_col).alias("group"), "ts", h.alias("h"))
        .groupBy("group")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )
