"""Streaming profile monitor: per-micro-batch metrics into the
MetricsRepository, so the cross-run gates (regressions, control_chart)
run over a LIVE stream's batches exactly as they do over batch runs.

This is the streaming twin of the run-level metrics loop: each
micro-batch's one-pass cube profile (operators/metrics_repo.py
profile_metrics) is committed atomically with the batch id as run_id,
and the epoch guard makes replays no-ops (a foreachBatch body can be
re-invoked with the same batch after a crash — the reference's resume
analog is htm_streamer/run_htm_streamer.py's cold restart, which
recomputes everything; here the guard rides in the same commit).

Scale notes: the profile is one cube aggregation per micro-batch; the
repository write is metadata-sized. The monitor adds no per-row Python
and no extra scan beyond the one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.operators.metrics_repo import (
    MetricsRepository,
    profile_metrics,
)

__all__ = ["start_profile_monitor"]


def start_profile_monitor(
    stream_df: DataFrame,
    repo: MetricsRepository,
    segment_col: str,
    numeric_cols: list[str],
    checkpoint_dir: str,
    query_name: str = "profile-monitor",
):
    """Attach a metrics-profile foreachBatch sink to ``stream_df``.
    Each micro-batch commits its profile under run_id = batch_id + 1
    (run ids are 1-based so batch 0 still beats the "run_id < cur"
    comparison). Replayed batches are skipped via the epoch prop
    recorded in the SAME atomic commit as the metrics."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        guard = f"monitor_epoch_{query_name}"
        last = repo.catalog.prop(guard)
        if last is not None and int(last) >= batch_id:
            return  # replay after crash: already committed
        prof = profile_metrics(batch_df, segment_col, numeric_cols)
        tagged = prof.select(
            F.lit(int(batch_id) + 1).alias("run_id"),
            "metric",
            "segment",
            "value",
        )
        repo.catalog.stage_spark(repo.TABLE, tagged)
        repo.catalog.commit(props={guard: str(batch_id)})

    return (
        stream_df.writeStream.foreachBatch(_write)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
