"""Cross-run metric regression detection — the metrics repository.

The per-partition checkpoint (streaming/incremental.py) answers "did
THIS run's partitions pass". This module answers the longitudinal
question: did the table's profile move between run N−1 and run N —
mean shifted, null rate crept up, a segment vanished? That's the check
that catches slow corpus rot no single-run gate sees (the reference
keeps no run-over-run state at all; each invocation starts cold —
htm_streamer/run_htm_streamer.py).

Pieces:

- ``profile_metrics``: one-pass long-format profile of a table —
  ``cube(segment)`` computes the global and per-segment levels in a
  SINGLE aggregation (no second scan for the global row), then a
  constant-width ``stack`` melts the 1-row-per-group frame to
  (metric, segment, value).
- ``MetricsRepository``: persists profiles per run_id into a catalog
  table (ManifestCatalog or the Iceberg binding — same interface,
  atomic commit), and diffs a run against the latest prior run with
  relative+absolute tolerances, classifying every (metric, segment)
  as ok / breach / new / gone.

Scale notes: the profile is one cube shuffle over the fact table; the
repository tables are |metrics|·|segments| rows — metadata-scale.
Regression diffing joins two such frames; never touches facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["profile_metrics", "MetricsRepository"]

GLOBAL_SEGMENT = "_global_"


def profile_metrics(
    df: DataFrame, segment_col: str, numeric_cols: list[str]
) -> DataFrame:
    """Long-format profile (metric, segment, value): row_count plus
    mean/null_rate per numeric column, at BOTH the global level and
    per segment, from one ``cube`` aggregation pass."""
    aggs = [F.count(F.lit(1)).cast("double").alias("row_count")]
    names = ["row_count"]
    for c in numeric_cols:
        aggs.append(F.avg(F.col(c).cast("double")).alias(f"mean_{c}"))
        aggs.append(
            F.avg(F.col(c).isNull().cast("double")).alias(f"null_rate_{c}")
        )
        names += [f"mean_{c}", f"null_rate_{c}"]
    cubed = df.cube(segment_col).agg(*aggs)
    seg = F.coalesce(
        F.col(segment_col).cast("string"), F.lit(GLOBAL_SEGMENT)
    )
    stack_args = ", ".join(f"'{n}', `{n}`" for n in names)
    return cubed.select(
        seg.alias("segment"),
        F.expr(f"stack({len(names)}, {stack_args}) AS (metric, value)"),
    ).select("metric", "segment", "value")


class MetricsRepository:
    """Run-over-run metric store + regression gate on top of a catalog
    (ManifestCatalog or IcebergCatalog — anything with
    stage_spark/commit/read). Each ``save`` is one atomic commit of
    that run's full profile tagged with ``run_id``."""

    TABLE = "metrics_history"

    def __init__(self, catalog):
        self.catalog = catalog

    def save(self, df: DataFrame, run_id: int) -> int:
        tagged = df.select(
            F.lit(int(run_id)).alias("run_id"), "metric", "segment", "value"
        )
        self.catalog.stage_spark(self.TABLE, tagged)
        return self.catalog.commit(
            props={f"metrics_run_{int(run_id)}": "committed"}
        )

    def history(self, spark: SparkSession) -> DataFrame | None:
        return self.catalog.read(spark, self.TABLE)

    def regressions(
        self,
        spark: SparkSession,
        run_id: int,
        rel_tol: float = 0.10,
        abs_tol: float = 1e-9,
    ) -> DataFrame:
        """Diff ``run_id`` against the latest run before it. Returns
        (metric, segment, prev_value, cur_value, rel_change, status)
        with status ∈ {'ok','breach','new','gone'}: breach when the
        value moved more than ``rel_tol`` relatively AND ``abs_tol``
        absolutely; new/gone when the (metric, segment) key appears or
        disappears — both worth alerting on (a vanished segment IS the
        regression). Empty frame (with schema) when no prior run."""
        hist = self.history(spark)
        schema = (
            "metric string, segment string, prev_value double, "
            "cur_value double, rel_change double, status string"
        )
        if hist is None:
            return spark.createDataFrame([], schema)
        prev_ids = [
            r["m"]
            for r in hist.filter(F.col("run_id") < run_id)
            .agg(F.max("run_id").alias("m"))
            .collect()
            if r["m"] is not None
        ]
        if not prev_ids:
            return spark.createDataFrame([], schema)
        prev_id = prev_ids[0]  # one scalar — metadata, not data
        cur = hist.filter(F.col("run_id") == run_id).select(
            "metric", "segment", F.col("value").alias("cur_value")
        )
        prev = hist.filter(F.col("run_id") == prev_id).select(
            "metric", "segment", F.col("value").alias("prev_value")
        )
        j = prev.join(cur, ["metric", "segment"], "full_outer")
        diff = F.abs(F.col("cur_value") - F.col("prev_value"))
        denom = F.greatest(F.abs(F.col("prev_value")), F.lit(1e-300))
        rel = diff / denom
        status = (
            F.when(F.col("prev_value").isNull(), "new")
            .when(F.col("cur_value").isNull(), "gone")
            .when((rel > rel_tol) & (diff > abs_tol), "breach")
            .otherwise("ok")
        )
        return j.select(
            "metric",
            "segment",
            "prev_value",
            "cur_value",
            F.when(
                F.col("prev_value").isNotNull()
                & F.col("cur_value").isNotNull(),
                F.round(rel, 6),
            ).alias("rel_change"),
            status.alias("status"),
        )
