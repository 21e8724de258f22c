"""Custom stateful streaming operator: per-series anomaly likelihood
whose state spans micro-batches, via ``applyInPandasWithState``.

This is the true-streaming form of ST5 (stateful sequential scoring):
the batch tier (`operators/likelihood.py:anomaly_likelihood_exact`)
scores a whole series in one grouped-map call; here the same semantics
continue across micro-batches — the group state carries the moving-
average tail, the historic score/value window, the fitted distribution
and the filter's previous raw value, so feeding a series in N chunks
produces EXACTLY the rows the batch kernel produces on the
concatenation (pinned to 1e-12 in tests).

Reference analog: the stream runner re-invokes a stateless kernel per
row with all state round-tripping the filesystem
(/root/reference/htm_streamer/pipeline/htm_stream_runner.py:77-92);
here Spark's state store holds it and rows arrive in Arrow batches.

Scale notes: state per series is bounded (historic_window doubles ×2 +
averaging window); series hash-partition across executors; inside a
group the math is the same segment-vectorized numpy as the batch
kernel — per-segment, never per-row Python.

Ordering contract: a group's micro-batch rows are MATERIALIZED and
sorted by ts once per micro-batch (applyInPandasWithState hands the
group's rows as multiple Arrow chunks in arbitrary shuffle order —
sorting each chunk independently, as an earlier version did, silently
mis-orders any series wider than one Arrow batch). Across micro-batches
the operator enforces monotone time per series: a batch whose earliest
ts precedes the state's last scored ts raises ValueError (the defined
behavior for out-of-order arrival — route through an upstream watermark
+ sort if the source can deliver late data, as with any order-dependent
stateful operator). Memory note: materializing one group's micro-batch
is bounded by (rows per series per trigger), not by the series history —
state stays bounded by historic_window regardless.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from htm_streamer_spark.config import (
    FLAT_VARIANCE_GUARD,
    MEAN_FLOOR,
    VAR_FLOOR,
)

STATE_SCHEMA = (
    "n_seen long, ma_tail array<double>, hist_scores array<double>, "
    "hist_values array<double>, mean double, stdev double, has_dist boolean, "
    "prev_raw double, last_ts_us long"
)
OUTPUT_SCHEMA = "series_id string, ts timestamp, score double, anomaly_likelihood double"


def likelihood_state_fn(
    learning_period: int = 288,
    estimation_samples: int = 100,
    historic_window: int = 8640,
    reestimation_period: int = 100,
    averaging_window: int = 10,
):
    """Factory for the applyInPandasWithState function. All numerics are
    defined inside the closure (cloudpickle by-value, executors need no
    package on PYTHONPATH)."""
    probation = learning_period + estimation_samples
    mean_floor, var_floor, flat_guard = MEAN_FLOOR, VAR_FLOOR, FLAT_VARIANCE_GUARD

    def _erfc(z: np.ndarray) -> np.ndarray:
        sign = np.sign(z)
        az = np.abs(z)
        t = 1.0 / (1.0 + 0.3275911 * az)
        poly = t * (
            0.254829592
            + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
        )
        res = poly * np.exp(-az * az)
        return np.where(sign < 0, 2.0 - res, res)

    def _mov_avg(scores: np.ndarray, window: int) -> np.ndarray:
        n = len(scores)
        csum = np.cumsum(scores)
        idx = np.arange(n)
        lo = np.maximum(0, idx - window + 1)
        prev = np.where(lo > 0, csum[np.maximum(lo - 1, 0)], 0.0)
        return (csum - prev) / (idx - lo + 1)

    def _fit(hist_s: np.ndarray, hist_v: np.ndarray, r: int):
        """Distribution from the historic window as of global row r —
        identical to the batch kernel's refit."""
        shifted_out = max(0, r - historic_window)
        skip = min(r, max(0, learning_period - shifted_out))
        if len(hist_s) == 0 or len(hist_s) <= skip:
            return 0.5, 1e3
        hist_mas = _mov_avg(hist_s, averaging_window)
        sample = hist_mas[skip:]
        mean = max(float(np.mean(sample)), mean_floor)
        var = max(float(np.var(sample)), var_floor)
        stdev = var**0.5
        if float(np.var(hist_v[skip:])) < flat_guard:
            return 0.5, 1e3
        return mean, stdev

    def fn(key, pdf_iter, state):
        if state.exists:
            st = state.get
            n_seen, ma_tail, hist_s, hist_v, mean, stdev, has_dist, prev_raw = st[:8]
            last_ts_us = st[8] if len(st) > 8 and st[8] is not None and st[8] >= 0 else None
            ma_tail = np.asarray(ma_tail, dtype=np.float64)
            hist_s = np.asarray(hist_s, dtype=np.float64)
            hist_v = np.asarray(hist_v, dtype=np.float64)
        else:
            n_seen, mean, stdev, has_dist, prev_raw = 0, 0.5, 1e3, False, 1.0
            last_ts_us = None
            ma_tail = np.empty(0)
            hist_s = np.empty(0)
            hist_v = np.empty(0)

        # applyInPandasWithState may hand one group's micro-batch as
        # SEVERAL Arrow chunks in arbitrary order; state carries across
        # chunks, so sorting per-chunk would mis-order the series.
        # Materialize the whole group batch (bounded by rows-per-trigger
        # for this series) and sort by ts exactly once.
        parts = [pdf for pdf in pdf_iter if len(pdf)]
        batch = (
            pd.concat(parts, ignore_index=True) if len(parts) != 1 else parts[0]
        ) if parts else None

        for pdf in ([batch] if batch is not None else []):
            pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
            # monotone-time guard across micro-batches: silently scoring
            # late rows would diverge from the batch kernel with no error
            batch_min_us = int(pdf["ts"].iloc[0].value) // 1000
            if last_ts_us is not None and batch_min_us < last_ts_us:
                raise ValueError(
                    f"out-of-order micro-batch for series {key[0]!r}: "
                    f"batch min ts {pdf['ts'].iloc[0]} precedes last scored ts "
                    f"{pd.Timestamp(last_ts_us * 1000)}; add an upstream "
                    "watermark + sort before the stateful operator"
                )
            last_ts_us = int(pdf["ts"].iloc[-1].value) // 1000
            scores = pdf["score"].to_numpy(dtype=np.float64)
            values = pdf["value"].to_numpy(dtype=np.float64)
            n = len(pdf)

            # moving average continues from the stored tail: compute over
            # (tail + batch) and keep the batch suffix. The tail holds ALL
            # prior scores while n_seen < window, so early divisors match.
            cat = np.concatenate([ma_tail, scores])
            ma = _mov_avg(cat, averaging_window)[len(ma_tail):]

            # concat-space view of the historic window: hist_s holds the
            # last `historic_window` pre-batch scores, so global row
            # (n_seen + i) sits at concat index (len(hist_s) + i)
            all_s = np.concatenate([hist_s, scores])
            all_v = np.concatenate([hist_v, values])
            base = len(hist_s)

            out = np.full(n, 0.5, dtype=np.float64)
            # refit points inside this batch, in global coordinates
            g0, g1 = n_seen, n_seen + n
            refits = [g for g in range(max(g0, probation), g1)
                      if g == probation or (g > probation and g % reestimation_period == 0)]
            # segment starts: batch start (with carried dist) + each refit
            seg_starts = sorted(g for g in {max(g0, probation), *refits} if g < g1)
            for si, r in enumerate(seg_starts):
                seg_end = seg_starts[si + 1] if si + 1 < len(seg_starts) else g1
                if r in refits or not has_dist:
                    lo = max(0, r - historic_window)
                    ci_lo, ci_hi = base + (lo - n_seen), base + (r - n_seen)
                    mean, stdev = _fit(all_s[ci_lo:ci_hi], all_v[ci_lo:ci_hi], r)
                    has_dist = True
                seg = ma[r - g0 : seg_end - g0]
                flipped = np.where(seg < mean, 2 * mean - seg, seg)
                z = (flipped - mean) / stdev
                out[r - g0 : seg_end - g0] = 1.0 - 0.5 * _erfc(z / 1.4142)

            # _filterLikelihoods across the batch boundary via prev_raw
            red_t, yellow_t = 1.0 - 0.99999, 1.0 - 0.999
            raw = 1.0 - out
            prev = np.concatenate([[prev_raw], raw[:-1]])
            out = 1.0 - np.where((raw <= red_t) & (prev <= red_t), yellow_t, raw)
            prev_raw = float(raw[-1])

            yield pd.DataFrame(
                {
                    "series_id": key[0],
                    "ts": pdf["ts"],
                    "score": scores,
                    "anomaly_likelihood": out,
                }
            )

            n_seen += n
            keep_ma = averaging_window - 1
            if keep_ma <= 0:
                ma_tail = np.empty(0)
            else:
                ma_tail = cat[-keep_ma:] if n_seen >= keep_ma else cat
            hist_s = all_s[-historic_window:]
            hist_v = all_v[-historic_window:]

        state.update(
            (
                int(n_seen),
                [float(x) for x in ma_tail],
                [float(x) for x in hist_s],
                [float(x) for x in hist_v],
                float(mean),
                float(stdev),
                bool(has_dist),
                float(prev_raw),
                int(last_ts_us) if last_ts_us is not None else -1,
            )
        )

    return fn


def stateful_likelihood_stream(stream_df, **params):
    """Wire the state function onto a streaming DataFrame with columns
    (series_id, ts, value, score). Output appends one scored row per
    input row; state persists in Spark's state store per series."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream_df.groupBy("series_id").applyInPandasWithState(
        likelihood_state_fn(**params),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
