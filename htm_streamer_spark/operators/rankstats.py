"""Rank-based statistics — the nonparametric half of the validator's
test battery (operators/stattests.py holds the moment/ECDF half).

- Spearman rank correlation per group: monotone-trend detection (is
  `value` drifting with time?) that Pearson misses on nonlinear trends
  and outliers poison. The validator's "is this column trending"
  check, complementing the distributional KS/PSI gates (reference
  gate: htm_streamer/utils/anomaly.py moving-window comparison).
- Mann-Whitney U (rank-sum) per group: two-sample location-shift test
  with tie correction — the robust complement to the KS distance
  (KS sees any distributional change; MWU isolates a median shift and
  ignores pure variance changes).

Both use textbook AVERAGE ranks for ties, computed per row without a
join-back: ``avg_rank = rank() + (count over the tie bucket - 1)/2``
(min-rank plus half the tie span). All arithmetic is window + power
sums — exact, engine-agnostic (any SQL engine reproduces it bitwise up
to summation rounding), zero Python in the plan.

Scale notes: each statistic is one or two per-group sort windows over
the fact table (the same accepted hot-group serial bound as
operators/likelihood.py) plus a map-side-combinable aggregation. No
collect, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_corr", "mann_whitney_u"]


def _avg_rank(group_col: str, value_col: str):
    """Average (midrank) of ``value_col`` within ``group_col``."""
    order = Window.partitionBy(group_col).orderBy(value_col)
    ties = Window.partitionBy(group_col, value_col)
    return F.rank().over(order) + (F.count(F.lit(1)).over(ties) - 1) / 2.0


def spearman_corr(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Spearman rank correlation of ``x_col`` vs ``y_col`` per group:
    Pearson correlation of the midranks, the tie-correct general form
    (the 6Σd² shortcut is only valid without ties). Returns
    (group, n, spearman_rho). rho is null for degenerate groups
    (either column constant)."""
    ranked = df.select(
        group_col,
        _avg_rank(group_col, x_col).alias("rx"),
        _avg_rank(group_col, y_col).alias("ry"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("rx").alias("mx"),
        F.avg("ry").alias("my"),
        F.avg(F.col("rx") * F.col("ry")).alias("mxy"),
        F.avg(F.col("rx") * F.col("rx")).alias("mxx"),
        F.avg(F.col("ry") * F.col("ry")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    vx = F.col("mxx") - F.col("mx") ** 2
    vy = F.col("myy") - F.col("my") ** 2
    return agg.select(
        group_col,
        "n",
        F.round(cov / F.sqrt(vx * vy), 6).alias("spearman_rho"),
    )


def mann_whitney_u(
    df: DataFrame, group_col: str, value_col: str, sample_col: str
) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) per group between the two
    samples tagged 0/1 in ``sample_col``: U for sample 1, plus the
    tie-corrected normal z-score. Midranks over the POOLED values; the
    tie correction subtracts Σ(t³−t)/(N(N−1)) from the variance (t =
    size of each tie bucket). Returns (group, n0, n1, u1, mwu_z); z is
    null when every pooled value ties (zero variance)."""
    ranked = df.select(
        group_col,
        F.col(sample_col).alias("s"),
        _avg_rank(group_col, value_col).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy(group_col, value_col))
        .alias("t"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.sum(F.when(F.col("s") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("s") == 1, F.col("r"))).alias("r1"),
        # each tie bucket of size t contributes t rows of (t^2 - 1),
        # totalling t^3 - t — no distinct-bucket re-aggregation needed
        F.sum(F.col("t").cast("double") * F.col("t") - 1.0).alias(
            "tie_sum"
        ),
    )
    n0 = F.col("n0").cast("double")
    n1 = F.col("n1").cast("double")
    n = n0 + n1
    u1 = F.col("r1") - n1 * (n1 + 1) / 2.0
    mean_u = n0 * n1 / 2.0
    var_u = (
        n0 * n1 / 12.0 * ((n + 1) - F.col("tie_sum") / (n * (n - 1)))
    )
    return agg.select(
        group_col,
        "n0",
        "n1",
        F.round(u1, 6).alias("u1"),
        F.round(
            F.when(var_u > 0, (u1 - mean_u) / F.sqrt(var_u)), 6
        ).alias("mwu_z"),
    )
