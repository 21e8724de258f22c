"""Split-conformal anomaly p-values — the DISTRIBUTION-FREE member of
the anomaly family.

The likelihood scorer (operators/likelihood.py, reference formulas:
htm_streamer/utils/anomaly.py) assumes the Gaussian tail it fits;
conformal prediction (Vovk et al.) makes NO distributional assumption:
with a calibration sample c_1..c_n and a scored value v, the p-value

    p(v) = (1 + #{i : c_i >= v}) / (n + 1)

is valid by exchangeability alone — P(p <= alpha) <= alpha for ANY
underlying distribution, exactly, at finite n. That guarantee is what
a validation gate wants when the value column is fat-tailed, bimodal,
or simply unknown: the false-alarm budget holds with no tuning.

Scale notes: the p-value depends only on (group, value), so the whole
computation runs on the tie-collapsed per-(group, value) frame — one
``groupBy(group, value)`` shuffle of the fact table, then one
per-group descending cumulative window over DISTINCT values (the same
accepted hot-group bound as ks_two_sample). No collect, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["conformal_pvalues"]


def conformal_pvalues(
    df: DataFrame,
    group_col: str,
    value_col: str,
    sample_col: str,
    *,
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group one-sided (upper-tail) split-conformal p-values.

    ``sample_col`` must be an int column in {0, 1}: 0 tags the
    CALIBRATION sample (e.g. the baseline epoch), 1 the scored rows
    (current epoch) — the same epoch convention as ``ks_two_sample``.
    For every distinct scored value v the p-value counts calibration
    values >= v (ties count — the conservative, validity-preserving
    convention). An empty calibration sample yields p = 1 for every
    row: the vacuous-but-valid conformal answer, never a false alarm.

    Returns one row per distinct SCORED value:
    (group, value, n_scored_at, n_calib, n_calib_ge, p_value,
    is_anomalous), p at 6 dp, flag at ``p <= alpha``. Per-row scoring
    is the trivial join of this frame back on (group, value).
    """
    g, v = group_col, value_col
    per_value = df.groupBy(g, v).agg(
        F.sum(F.when(F.col(sample_col) == 0, 1).otherwise(0)).alias("_c0"),
        F.sum(F.when(F.col(sample_col) == 1, 1).otherwise(0)).alias("_c1"),
    )
    w_desc = (
        Window.partitionBy(g)
        .orderBy(F.col(v).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(g)
    n_ge = F.sum("_c0").over(w_desc)
    n_cal = F.sum("_c0").over(tot)
    p = (1.0 + n_ge) / (n_cal + 1.0)
    return (
        per_value.select(
            g,
            v,
            F.col("_c1").cast("long").alias("n_scored_at"),
            n_cal.cast("long").alias("n_calib"),
            n_ge.cast("long").alias("n_calib_ge"),
            F.round(p + F.lit(1e-9), 6).alias("p_value"),
            (p <= alpha).alias("is_anomalous"),
        )
        .where(F.col("n_scored_at") > 0)
    )
