"""Isotonic (monotone non-decreasing) regression at bucket granularity
— the SHAPE-CONSTRAINED member of the trend family: Theil–Sen and
Mann–Kendall ask "is there a monotone trend?", isotonic regression
fits THE monotone curve itself (the calibration a validator compares
new data against: score-vs-length, value-vs-hour, rate-vs-size — any
relationship a contract says must not invert).

The textbook algorithm (pool-adjacent-violators, PAVA) is inherently
sequential. Distributing it EXACTLY is possible anyway because the
validator's input is bucketed: with B ordinal buckets per group
(hours, size bands, score deciles — tens, not millions), the minimax
identity

    iso(i) = max_{j<=i} min_{k>=i} wmean(y, j..k)

(Robertson–Wright–Dykstra 1988, eq. 1.9; equal to weighted PAVA on
the bucket means with bucket counts as weights, and PAVA on bucket
means with count weights equals PAVA on the raw rows) turns the fit
into joins + aggregates over the B-row bucket frame: interval means
from prefix sums (B² pairs), a min per (i, j), a max per i. The
B³ intermediate is bounded by the BUCKET count, never the row count —
at 100 TB the one fact-table shuffle is the bucket aggregate; all
minimax work happens on |groups| x B rows. The sequential-PAVA
shape is what this operator exists to avoid.

Reference parity: the reference has no shape-constrained fit; this
generalizes its per-feature min/max band checks
(htm_streamer/config/validation.py feature-bounds validation) to
"the relationship must be monotone" contracts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["isotonic_fit"]


def isotonic_fit(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Per-group isotonic (non-decreasing in ``x_col``) regression of
    the bucket means of ``y_col``, weighted by bucket counts — exact
    weighted PAVA via the minimax identity (module docstring).

    ``x_col`` must be an ordinal bucket (int hour, band id, decile…);
    the caller buckets continuous x first. NULL y rows are dropped.
    Returns (group, x, n, mean_y, iso_y): the raw bucket mean and the
    monotone-calibrated value, 6 dp. ``iso_y`` is non-decreasing in x
    within every group, preserves each group's weighted mean, and
    equals ``mean_y`` wherever the data is already monotone.

    Plan: ONE fact-table shuffle (the (group, x) aggregate); prefix
    sums via a window on the B-row bucket frame; the (j, k) interval
    grid and the position join are group-equi joins with range
    residuals on that frame (B² and B³ rows, B = bucket count); two
    final aggregates (min per (i, j), max per i). No UDFs, no
    sequential pass.
    """
    g = group_col
    agg = (
        df.where(F.col(y_col).isNotNull())
        .groupBy(g, F.col(x_col).alias("x"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("_w"),
            F.sum(F.col(y_col).cast("double")).alias("_sy"),
        )
    )
    # the bucket frame feeds the prefix window, the pair grid, and the
    # position join: persist so the fact aggregate runs once
    agg = agg.persist()
    w_pre = (
        Window.partitionBy(g)
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = agg.select(
        g,
        "x",
        "_w",
        "_sy",
        F.sum("_sy").over(w_pre).alias("_cy"),
        F.sum("_w").over(w_pre).alias("_cw"),
    )
    lo = pre.select(
        F.col(g).alias("_g"),
        F.col("x").alias("_xj"),
        (F.col("_cy") - F.col("_sy")).alias("_cyj"),
        (F.col("_cw") - F.col("_w")).alias("_cwj"),
    )
    hi = pre.select(
        F.col(g).alias("_g"),
        F.col("x").alias("_xk"),
        F.col("_cy").alias("_cyk"),
        F.col("_cw").alias("_cwk"),
    )
    pairs = lo.join(hi, "_g").where(F.col("_xj") <= F.col("_xk")).select(
        "_g",
        "_xj",
        "_xk",
        (
            (F.col("_cyk") - F.col("_cyj"))
            / (F.col("_cwk") - F.col("_cwj"))
        ).alias("_m"),
    )
    pos = agg.select(F.col(g).alias("_g"), F.col("x").alias("_xi"))
    spanning = pairs.join(pos, "_g").where(
        (F.col("_xj") <= F.col("_xi")) & (F.col("_xi") <= F.col("_xk"))
    )
    inner = spanning.groupBy("_g", "_xi", "_xj").agg(
        F.min("_m").alias("_minm")
    )
    iso = inner.groupBy("_g", "_xi").agg(F.max("_minm").alias("_iso"))
    return (
        agg.join(
            iso,
            (F.col(g) == F.col("_g")) & (F.col("x") == F.col("_xi")),
        )
        .select(
            g,
            "x",
            F.col("_w").alias("n"),
            F.round(
                F.col("_sy") / F.col("_w") + F.lit(1e-9), 6
            ).alias("mean_y"),
            F.round(F.col("_iso") + F.lit(1e-9), 6).alias("iso_y"),
        )
    )
