"""Stream-stream interval join with watermark-bounded state — the
Structured-Streaming-native member of the join family (SURVEY.md §2.3:
the reference attaches labels to outputs only within a bounded batch;
Spark's watermarked stream-stream join is the unbounded-input form).

The same ``interval_join_streams`` plan runs in BOTH execution modes:
over batch DataFrames the watermarks are no-ops and the result is the
exact interval join (the DuckDB-oracle target); over two ``readStream``
sources Spark buffers each side's rows in state ONLY until the other
side's watermark passes the end of their join-time range — the time
bound in the join condition is what makes state eviction possible at
all, so the range predicate is mandatory here, not an optimization.

Scale notes: the join shuffles both sides on the equi-key; per-key rows
meet in one state-store partition. A hot key serializes in that
partition's task — the same accepted bound as the as-of/likelihood
operators (operators/asof.py docstring). The time-range width times
per-key event rate bounds the state size per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    lower: str = "0 seconds",
    upper: str = "10 minutes",
    watermark: str | None = "5 minutes",
) -> DataFrame:
    """Inner join of two (keyed, timestamped) frames where
    ``right_ts ∈ [left_ts + lower, left_ts + upper]``.

    Column names (other than ``key``) must be disjoint between the two
    sides; ``left_ts``/``right_ts`` name each side's event-time column.
    Returns left columns + right columns for every qualifying pair.
    """
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    lk, rk = f"__lk_{key}", f"__rk_{key}"
    lf = left.withColumnRenamed(key, lk)
    rf = right.withColumnRenamed(key, rk)
    cond = (
        (F.col(lk) == F.col(rk))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(f"INTERVAL {lower}"))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return (
        lf.join(rf, cond, "inner")
        .withColumnRenamed(lk, key)
        .drop(rk)
    )
