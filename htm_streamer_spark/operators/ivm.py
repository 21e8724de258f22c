"""Incremental view maintenance: keep grouped aggregates current by
applying a snapshot delta instead of recomputing from scratch.

At 10^12 rows the daily "refresh the per-source counts" job must not
re-scan the corpus: a crawl refresh touches a tiny fraction of keys,
and `operators/delta.py:snapshot_diff` already produces exactly that
key set. This module closes the loop for the distributive aggregates
(COUNT / SUM — mean/null-rate derive from them): the maintenance
work is proportional to the DELTA, never to the table.

Shape:

- ``grouped_totals`` — the materialized view: (group, n, total).
- ``incremental_totals`` — given the old view, both snapshots and the
  diff, produce the new view: the diff's keys semi-join each snapshot
  (removed+changed keys pull their OLD rows as negative contributions,
  added+changed keys pull their NEW rows as positive ones), the union
  collapses to one delta row per touched group (map-side combinable),
  and a full-outer merge against the old view applies it. Groups whose
  count reaches zero are dropped — a vanished group must vanish from
  the view, not linger as (0, 0).

Everything shuffles at delta/view width; the snapshots are only
touched by key semi-joins (broadcast-able when the delta is small,
co-located under a shared bucket layout otherwise).

The invariant — incremental == recompute-from-scratch on the new
snapshot — is pinned both in tests (randomized mutations) and by the
driver oracle, whose SQL recomputes the view directly.

Reference analog: the reference recomputes every per-series statistic
from the full history each run (/root/reference/htm_streamer/
run_htm_streamer.py cold start); maintenance-by-delta is the
distributed answer.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_totals", "incremental_totals"]


def grouped_totals(
    df: DataFrame, group_cols: Sequence[str], value_col: str
) -> DataFrame:
    """The materialized view: (group..., n, total)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast("double")).alias("total"),
    )


def incremental_totals(
    old_view: DataFrame,
    old_snap: DataFrame,
    new_snap: DataFrame,
    diff: DataFrame,
    key_col: str,
    group_cols: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Apply a ``snapshot_diff`` result to ``old_view``; returns the
    new (group..., n, total) view. ``diff`` rows carry (key, change ∈
    added|removed|changed)."""
    gcols = list(group_cols)
    out_keys = diff.filter(F.col("change").isin("removed", "changed")).select(
        F.col("key").alias(key_col)
    )
    in_keys = diff.filter(F.col("change").isin("added", "changed")).select(
        F.col("key").alias(key_col)
    )
    leaving = (
        old_snap.join(out_keys, key_col, "left_semi")
        .groupBy(*gcols)
        .agg(
            (-F.count(F.lit(1))).alias("dn"),
            (-F.sum(F.col(value_col).cast("double"))).alias("dtotal"),
        )
    )
    entering = (
        new_snap.join(in_keys, key_col, "left_semi")
        .groupBy(*gcols)
        .agg(
            F.count(F.lit(1)).alias("dn"),
            F.sum(F.col(value_col).cast("double")).alias("dtotal"),
        )
    )
    delta = (
        leaving.unionByName(entering)
        .groupBy(*gcols)
        .agg(F.sum("dn").alias("dn"), F.sum("dtotal").alias("dtotal"))
    )
    merged = old_view.join(delta, gcols, "full_outer").select(
        *gcols,
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("dn"), F.lit(0))).alias(
            "n"
        ),
        (
            F.coalesce(F.col("total"), F.lit(0.0))
            + F.coalesce(F.col("dtotal"), F.lit(0.0))
        ).alias("total"),
    )
    return merged.filter(F.col("n") > 0)
