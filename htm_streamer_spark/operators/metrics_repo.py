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

    def control_chart(
        self,
        spark: SparkSession,
        run_id: int,
        lam: float = 0.3,
        k: float = 3.0,
        min_history: int = 3,
        anchor_n: int = 5,
    ) -> DataFrame:
        """Two-gate control chart over the FULL run history (Deequ's
        anomaly-detection strategies), per (metric, segment):

        - **jump gate** ('anomaly'): current value more than ``k``
          residual-sigmas from the EWMA forecast of the prior runs
          (weight ``lam`` on the newest). Catches step changes while
          tolerating metrics that are just noisy (their sigma is wide).
        - **drift gate** ('drift'): current value more than ``k``
          anchor-sigmas from the mean of the FIRST ``anchor_n`` runs
          (CUSUM-style fixed reference). A slow drift is invisible to
          any adaptive forecast — the EWMA follows it and the drift
          inflates its own residual sigma — so only a fixed early
          anchor can catch "4% per run, forever". The anchor sigma is
          floored at 0.5% of the anchor level so a zero-noise history
          doesn't flag measurement dust.

        All array work is JVM-side HOFs (`aggregate` over the sorted
        run history) on a |metrics|·|segments|-row frame — metadata
        scale by construction. Keys with fewer than ``min_history``
        prior runs are reported 'insufficient_history', never flagged.
        Returns (metric, segment, forecast, sigma, anchor_mean,
        cur_value, status) with status ∈ {'ok','anomaly','drift',
        'insufficient_history'}; 'anomaly' wins when both gates fire.
        """
        hist = self.history(spark)
        schema = (
            "metric string, segment string, forecast double, "
            "sigma double, anchor_mean double, cur_value double, "
            "status string"
        )
        if hist is None:
            return spark.createDataFrame([], schema)
        prior = (
            hist.filter(F.col("run_id") < run_id)
            .groupBy("metric", "segment")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("run_id", "value"))
                ).alias("h")
            )
            .select(
                "metric",
                "segment",
                F.transform(F.col("h"), lambda s: s["value"]).alias("xs"),
            )
        )
        # EWMA over the sorted history: fold λ·x + (1−λ)·acc, seeded
        # with the first observation
        ewma = F.aggregate(
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
            F.element_at(F.col("xs"), 1).cast("double"),
            lambda acc, x: F.lit(lam) * x + F.lit(1.0 - lam) * acc,
        )
        # residual spread of the history against its own running EWMA:
        # fold carrying (ewma, sum_sq, n) through the sequence
        resid_state = F.aggregate(
            F.slice(F.col("xs"), 2, F.greatest(F.size("xs") - 1, F.lit(0))),
            F.struct(
                F.element_at(F.col("xs"), 1).cast("double").alias("m"),
                F.lit(0.0).alias("ss"),
                F.lit(0).cast("long").alias("n"),
            ),
            lambda acc, x: F.struct(
                (F.lit(lam) * x + F.lit(1.0 - lam) * acc["m"]).alias("m"),
                (acc["ss"] + (x - acc["m"]) ** 2).alias("ss"),
                (acc["n"] + 1).alias("n"),
            ),
        )
        anchor = F.slice(F.col("xs"), 1, anchor_n)
        anchor_mean = F.aggregate(
            anchor, F.lit(0.0), lambda a, x: a + x
        ) / F.size(anchor)
        scored = prior.select(
            "metric",
            "segment",
            F.size("xs").alias("n_hist"),
            ewma.alias("forecast"),
            resid_state.alias("_rs"),
            anchor_mean.alias("anchor_mean"),
            anchor.alias("_anchor"),
        ).select(
            "metric",
            "segment",
            "n_hist",
            "forecast",
            F.when(
                F.col("_rs.n") > 0, F.sqrt(F.col("_rs.ss") / F.col("_rs.n"))
            ).alias("sigma"),
            "anchor_mean",
            F.sqrt(
                F.aggregate(
                    F.col("_anchor"),
                    F.lit(0.0),
                    lambda a, x: a + (x - F.col("anchor_mean")) ** 2,
                )
                / F.size("_anchor")
            ).alias("anchor_sigma"),
        )
        cur = hist.filter(F.col("run_id") == run_id).select(
            "metric", "segment", F.col("value").alias("cur_value")
        )
        j = scored.join(cur, ["metric", "segment"], "inner")
        dev = F.abs(F.col("cur_value") - F.col("forecast"))
        anchor_dev = F.abs(F.col("cur_value") - F.col("anchor_mean"))
        anchor_floor = F.greatest(
            F.col("anchor_sigma"),
            F.lit(0.005) * F.abs(F.col("anchor_mean")),
            F.lit(1e-12),
        )
        status = (
            F.when(F.col("n_hist") < min_history, "insufficient_history")
            .when(
                dev > F.lit(k) * F.greatest(F.col("sigma"), F.lit(1e-12)),
                "anomaly",
            )
            .when(anchor_dev > F.lit(k) * anchor_floor, "drift")
            .otherwise("ok")
        )
        return j.select(
            "metric",
            "segment",
            F.round("forecast", 6).alias("forecast"),
            F.round("sigma", 6).alias("sigma"),
            F.round("anchor_mean", 6).alias("anchor_mean"),
            "cur_value",
            status.alias("status"),
        )
