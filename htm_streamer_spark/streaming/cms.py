"""Streaming Count-Min frequency monitor — the CMS as a Structured
Streaming stateful operator (``applyInPandasWithState``).

Exact streaming frequency tracking needs state proportional to the
distinct-item domain — unbounded. The CMS state row is d·w int64
counters per key: FIXED-SIZE, ADDITIVE (state + batch histogram —
sketches of slices merge by summing cells), and therefore ORDER-FREE
like the KMV monitor: arrival order and micro-batch chunking cannot
change the final counters, and any chunking reproduces the batch
``cms_sketch`` cells exactly (integer adds — no float accumulation).
Contrast the path-dependent likelihood/SPRT tiers, which need the
monotone-ts guard; a counter array needs none.

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
"""

from __future__ import annotations

import numpy as np
import pandas as pd

STATE_SCHEMA = "cells array<long>, n_seen long"
OUTPUT_SCHEMA = "group string, item string, est long, n_seen long"


def cms_state_fn(d: int = 4, w: int = 256, threshold: int = 0):
    """Factory for the applyInPandasWithState function (closure holds
    the shape — executors need no package on PYTHONPATH)."""

    def fn(key, pdf_iter, state):
        if state.exists:
            cells_list, n_seen = state.get
            cells = np.asarray(cells_list, dtype=np.int64)
        else:
            cells, n_seen = np.zeros(d * w, dtype=np.int64), 0

        parts = [pdf for pdf in pdf_iter if len(pdf)]
        if not parts:
            state.update((cells.tolist(), n_seen))
            return iter([])
        batch = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
        # pos columns p0..p{d-1} were computed Spark-side; flat index i*w+p
        wt = batch["wt"].to_numpy(dtype=np.int64)
        for i in range(d):
            np.add.at(cells, i * w + batch[f"p{i}"].to_numpy(dtype=np.int64), wt)
        n_seen += int(wt.sum())
        state.update((cells.tolist(), n_seen))

        dd = batch.drop_duplicates(subset=["item"])
        est = np.min(
            np.stack(
                [cells[i * w + dd[f"p{i}"].to_numpy(dtype=np.int64)] for i in range(d)]
            ),
            axis=0,
        )
        out = pd.DataFrame(
            {
                "group": key[0],
                "item": dd["item"].to_numpy(),
                "est": est,
                "n_seen": n_seen,
            }
        )
        out = out[out["est"] >= threshold]
        return iter([out]) if len(out) else iter([])

    return fn


def streaming_cms(
    stream_df,
    group_col: str,
    item_col: str,
    d: int = 4,
    w: int = 256,
    count_col: str | None = None,
    threshold: int = 0,
):
    """Wire the CMS state fn onto a (streaming or batch-groupable)
    DataFrame carrying (``group_col``, ``item_col``[, ``count_col``]).
    Emits (group, item, est, n_seen) per distinct item per micro-batch
    — append semantics; estimates only ever grow, and the latest row
    per item is current. ``threshold`` turns the monitor into a
    heavy-hitter alarm (emit only items whose estimate crossed it)."""
    from pyspark.sql import functions as F

    from htm_streamer_spark.operators.cms import cms_positions

    pos = cms_positions(F.col(item_col), d, w)
    wgt = F.col(count_col).cast("long") if count_col else F.lit(1).cast("long")
    fn = cms_state_fn(d=d, w=w, threshold=threshold)
    return (
        stream_df.select(
            F.col(group_col).cast("string").alias("group"),
            F.col(item_col).cast("string").alias("item"),
            wgt.alias("wt"),
            *[p.alias(f"p{i}") for i, p in enumerate(pos)],
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
