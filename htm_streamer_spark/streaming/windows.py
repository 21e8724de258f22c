"""Event-time windowed aggregation with watermark-based late-data
handling — the Structured-Streaming-native member of the window-operator
family (SURVEY.md §2.5/§2.9: the reference's stream loop is
arrival-ordered and has no event-time semantics at all; Spark's
watermark + window is the idiomatic upgrade).

The same ``windowed_event_stats`` plan runs in BOTH execution modes:
over a batch DataFrame (watermark is a no-op there) it is the exact
answer and the DuckDB-oracle target; over a ``readStream`` source with
append output mode a window is emitted exactly once, when the
watermark (max event time seen minus the configured delay) passes the
window end, and events arriving later than the delay are dropped —
bounded state by construction, the only way windowed aggregation
survives an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    df: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = "5 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """(window_start, window_end, <key>, n_events, sum_value, avg_value)
    per event-time window per key. ``slide`` None → tumbling windows.

    On a streaming frame the caller's output mode decides emission
    semantics (append = once per finalized window). On a batch frame
    the watermark call is accepted and ignored by Spark — one code
    path, two engines.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        df.groupBy(win.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "n_events",
            "sum_value",
            "avg_value",
        )
    )


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state: keep the first row per
    key among events whose times fall within the watermark horizon.

    Plain ``dropDuplicates`` on a stream keeps every key ever seen —
    unbounded state, the classic streaming-dedup footgun.
    ``dropDuplicatesWithinWatermark`` evicts a key's state once the
    watermark passes its event time + delay, which is the only shape
    that survives an unbounded stream; the contract weakens accordingly
    (a duplicate arriving after its key was evicted is re-admitted —
    exactly the at-most-horizon guarantee a pipeline dedup wants).
    Batch twin: the same call degrades to dropDuplicates semantics.
    """
    out = df.withWatermark(ts_col, watermark)
    if df.isStreaming:
        return out.dropDuplicatesWithinWatermark(keys)
    return out.dropDuplicates(keys)
