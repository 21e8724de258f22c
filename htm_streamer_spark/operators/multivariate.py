"""Multivariate outlier scoring: per-row Mahalanobis distance.

The univariate outlier tier (ESD peel, Tukey fences, MAD z-scores —
``extremes.py``/``stattests.py``) misses the row that is unremarkable
in every column but impossible in their JOINT distribution (a doc with
median length AND median token count but a length/token ratio nothing
else has; an event whose value and payload magnitude are each in-band
but anti-correlated against the fleet). Mahalanobis distance
``d² = (x−μ)ᵀ Σ⁻¹ (x−μ)`` scores exactly that: it whitens by the
group's own covariance, so correlated columns stop double-counting and
the off-axis row lights up. Under multivariate normality d² ~ χ²(p),
giving a principled cut (p=2, 99% → 9.210).

Spark shape: ONE combinable power-sum aggregate per group (means,
variances, the cross moment) — the fact table is touched once; the
p×p covariance inverts in CLOSED FORM for p=2 inside the same select
(no numpy, no driver round-trip), and the per-row score is a codegen'd
expression over a broadcast-joined groups-sized stats frame. Everything
is ANSI-expressible, so the DuckDB oracle recomputes it exactly.

Reference analog: the reference scores each feature stream
independently (htm_streamer/model/runner.py per-feature models); the
joint-distribution check is the capability it lacked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# chi-square(df=2) inverse survival at conventional gates
CHI2_2DF_99 = 9.21034037197618


def mahalanobis_2d(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    id_col: str = "event_id",
    threshold: float = CHI2_2DF_99,
    ridge: float = 1e-12,
) -> DataFrame:
    """Per-row 2-D Mahalanobis distance vs the row's own group:
    (id, group, x, y, d2, is_outlier).

    Rows with a NULL in either feature are excluded (no imputation — a
    missing feature is the ``violations`` operators' job, not a
    distance of zero). Groups whose covariance is singular (constant
    column or |group| < 3: perfect correlation of a 2-point cloud)
    yield NULL d2 rather than an explosive ridge-dominated score; the
    ``ridge`` only guards benign near-singularity in the determinant.

    Plan: one groupBy power-sum aggregate (count, sums, squares, cross
    product) → groups-sized stats frame; closed-form 2×2 inverse
    ``Σ⁻¹ = 1/det · [[vy, −cxy], [−cxy, vx]]`` as column arithmetic;
    one broadcast join back; the score is pure codegen. Population
    (1/n) covariance — the χ² reference distribution's convention.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    # both the stats pass and the score pass re-derive this projection
    # (often including a JSON field extraction) from the scan — fan the
    # narrow frame out so a single-row-group input does not serialize
    # either pass onto one core (guide §2.5; no-op at real scale)
    rows = fan_out_narrow_scans(
        df.select(
            F.col(id_col).alias("_id"),
            F.col(group_col).alias("_grp"),
            x.alias("_x"),
            y.alias("_y"),
        )
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    stats = rows.groupBy("_grp").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("_x").alias("sx"),
        F.sum("_y").alias("sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("sxy"),
    )
    mx, my = F.col("sx") / F.col("n"), F.col("sy") / F.col("n")
    vx = F.col("sxx") / F.col("n") - mx * mx
    vy = F.col("syy") / F.col("n") - my * my
    cxy = F.col("sxy") / F.col("n") - mx * my
    det = vx * vy - cxy * cxy
    stats = stats.select(
        "_grp",
        mx.alias("mx"),
        my.alias("my"),
        vx.alias("vx"),
        vy.alias("vy"),
        cxy.alias("cxy"),
        det.alias("det"),
    )
    j = rows.join(F.broadcast(stats), "_grp")
    dx, dy = F.col("_x") - F.col("mx"), F.col("_y") - F.col("my")
    d2_raw: Column = (
        F.col("vy") * dx * dx
        - F.lit(2.0) * F.col("cxy") * dx * dy
        + F.col("vx") * dy * dy
    ) / (F.col("det") + F.lit(float(ridge)))
    d2 = F.when(F.col("det") > F.lit(float(ridge)), d2_raw)
    return j.select(
        F.col("_id").alias(id_col),
        F.col("_grp").alias(group_col),
        F.col("_x").alias(x_col),
        F.col("_y").alias(y_col),
        d2.alias("d2"),
        (d2 > F.lit(float(threshold))).alias("is_outlier"),
    )
