"""Same-pass pipeline metrics via Spark's Observation API.

Every accounting number the validation pipeline wants (rows scanned,
rows flagged, bytes of payload) is normally a SECOND aggregation —
at 100 TB, a second full pass over the corpus. ``df.observe`` attaches
aggregate metrics to the EXISTING action: the scan that computes the
real output also folds the metrics map-side, the driver collects them
from the task results, and the marginal cost is a few accumulators —
zero extra jobs, zero extra scans.

This is the engine-native replacement for the reference's hand-kept
running counters (htm_streamer run loop tallies anomalies per step in
python dicts): same numbers, but produced by the same distributed pass
that produced the data.

Works identically under Structured Streaming (metrics surface per
micro-batch in QueryProgressEvent.observedMetrics) — the batch form is
tested here; the streaming surface is the same API.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def with_observed_metrics(
    df: DataFrame,
    *,
    name: str = "pipeline_metrics",
    flag_col: str | None = None,
    extra: dict[str, Column] | None = None,
) -> tuple[DataFrame, Observation]:
    """Attach an Observation to ``df`` collecting ``n_rows`` (always),
    ``n_flagged`` (sum of ``flag_col`` cast to long, when given), and
    any ``extra`` aggregate columns — all folded into the NEXT action
    on the returned frame, no separate job.

    Returns (observed_df, observation); read ``observation.get`` AFTER
    an action has run on the observed frame (it blocks until then).
    """
    obs = Observation(name)
    metrics: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    if flag_col is not None:
        metrics.append(
            F.sum(F.col(flag_col).cast("long")).alias("n_flagged")
        )
    for alias, col in (extra or {}).items():
        metrics.append(col.alias(alias))
    return df.observe(obs, *metrics), obs
