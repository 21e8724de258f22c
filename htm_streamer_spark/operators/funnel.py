"""Ordered event-funnel analysis: how many users progressed through a
sequence of event types in order (signup -> click -> purchase, ...).

Reference parity: the reference validates per-sequence event ORDER with
its monotone-clock check (htm_streamer run_stream loop); this operator
generalizes that to cross-row ordering constraints — the product
analytics / user-journey query every event pipeline runs.

Scale design: a single shuffle. Events are partitioned by user and
sorted by (ts, tie-break) once; stage attainment is a chain of running
MAX window expressions over that one sort — stage i is reached at a row
iff the row is of stage-i type AND stage i-1 was already reached at a
strictly earlier-or-equal prior row. No self-joins (the naive funnel is
k-1 self-joins = k-1 shuffles of the full event table), no Python, no
state beyond the window frame. At 100 TB this is one exchange of the
narrow (user, ts, type) projection; per-user work is O(n) running max.

A hot user (bot traffic) serializes in one window task — the same
accepted bound as the likelihood and as-of operators; salting cannot
apply because stage attainment is a sequential property of the user's
full ordered history.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    stages: Sequence[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Count users reaching each prefix of ``stages`` in order.

    Returns one row per stage: (stage_idx, stage, n_users), where
    n_users is the number of distinct users with events matching
    stages[0..i] in non-decreasing time order (strictly increasing row
    order under the (ts, tiebreak) sort).
    """
    if not stages:
        raise ValueError("stages must be non-empty")
    if len(set(stages)) != len(stages):
        # a repeated stage would be satisfied by a SINGLE event: the
        # running max at a row includes that row, so stage i's "prior
        # stage reached" check sees stage i-1 flip on the same event.
        # Correct repeated-stage funnels need a count-based chain, which
        # this operator deliberately does not implement.
        raise ValueError("stages must be distinct")
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    df = events.select(user_col, ts_col, type_col, tiebreak_col)
    # reached_i (running): 1 from the first row where stage i occurs
    # after stage i-1 was already reached. reached_0 seeds the chain.
    prev = None
    reach_cols = []
    for i, stage in enumerate(stages):
        hit = F.col(type_col) == stage
        if prev is not None:
            hit = hit & (F.col(prev) == 1)
        col = f"_reached_{i}"
        df = df.withColumn(col, F.max(hit.cast("int")).over(w))
        reach_cols.append(col)
        prev = col
    per_user = df.groupBy(user_col).agg(
        *[F.max(c).alias(c) for c in reach_cols]
    )
    counts = per_user.agg(
        *[F.sum(c).cast("long").alias(f"_n_{i}") for i, c in enumerate(reach_cols)]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"_n_{i}").alias("n_users"),
            )
            for i, s in enumerate(stages)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select(
        "r.stage_idx", "r.stage", "r.n_users"
    )


def retention_cohorts(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> DataFrame:
    """Cohort retention triangle: users bucketed by their first-seen
    period (cohort), counted in every later period they were active.

    Periods are exact integer epoch buckets
    (unix_micros // (period_seconds * 1e6)) — no calendar/timezone
    semantics, so the result is reproducible bit-for-bit on any
    engine. Returns (cohort_period, period_offset, n_users), all
    BIGINT.

    Scale design: three key-partitioned shuffles of strictly
    shrinking frames. Shuffle 1 — the only one that sees event-scale
    data — collapses the stream to DISTINCT (user, period) with a
    map-side-combinable aggregation (100 TB of events -> at most
    |users| x |periods| rows). Shuffle 2 repartitions that collapsed
    frame by user for the per-user min window (tiny groups; a hot
    user owns at most |periods| rows, so there is no skew surface).
    Shuffle 3 is the map-side-combinable (cohort, offset) count of
    the same collapsed frame. No Python, no collect.
    """
    period = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        / F.lit(int(period_seconds) * 1_000_000)
    ).cast("long")
    uw = (
        events.select(F.col(user_col).alias("_u"), period.alias("_p"))
        .groupBy("_u", "_p")
        .agg(F.count(F.lit(1)).alias("_dummy"))
        .drop("_dummy")
    )
    w = Window.partitionBy("_u")
    cohorted = uw.withColumn("_cohort", F.min("_p").over(w))
    return (
        cohorted.groupBy(
            F.col("_cohort").cast("long").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).cast("long").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
