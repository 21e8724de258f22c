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


def session_window_stats(
    df: DataFrame,
    gap: str = "1 hour",
    watermark: str | None = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """(session_start, session_end, <key>, n_events, sum_value) per
    event-time SESSION per key — ``F.session_window``'s dynamic-gap
    windows, the streaming-native twin of the lag-based
    ``sessionize_events`` batch query.

    Session semantics (Spark's, pinned live by the batch test): each
    event extends its session to ``event_ts + gap``; the next event
    MERGES iff it starts at-or-before that end — touching intervals
    coalesce, so a spacing of EXACTLY ``gap`` still merges and a new
    session needs spacing strictly greater. ``session_end = last event
    ts + gap``. (Same boundary as the lag formulation ``diff > gap``
    used by the sessionize batch query and the DuckDB oracle.)

    On a streaming frame with append output mode a session is emitted
    exactly once, when the watermark passes its end — state is one
    open session per active key, merged/finalized by the engine, the
    bounded-state shape sessionization needs on an unbounded stream.
    On a batch frame the watermark is a no-op and the result is exact.
    """
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
            "sum_value",
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

    Surviving-row contract, stated per mode (they necessarily differ —
    a stream cannot know event-time order ahead of arrival):

    - streaming: the FIRST-ARRIVING row per key within the horizon
      survives (arrival order, Spark's dropDuplicatesWithinWatermark
      semantics);
    - batch: the EARLIEST row by (``ts_col``, then the remaining
      columns as a lexicographic tie-break) survives — a
      deterministic min_by selection, NOT an arbitrary
      partition-order-dependent dropDuplicates row, so reruns and
      tests get stable payload columns. Verified equal to a pandas
      sort+drop_duplicates oracle in tests/test_windowed_stream.py.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    other = [c for c in df.columns if c not in keys and c != ts_col]
    order = F.struct(F.col(ts_col), *[F.col(c) for c in other])
    row = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.min_by(row, order).alias("_row"))
        .select(*[F.col(f"_row.{c}").alias(c) for c in df.columns])
    )
