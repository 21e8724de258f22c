"""Closed-form parametric fits — the PARAMETRIC members of families
whose other members test or describe nonparametrically:

- ``weibull_gaps``: Weibull fit of per-entity inter-arrival gaps via
  the log-moment (Menon/Gumbel-relation) estimator. The arrival
  battery already TESTS exponentiality (stattests.exp_interarrival_ks)
  and scores dispersion (Fano); this quantifies HOW non-exponential:
  ln X of a Weibull(k, lam) is Gumbel with scale 1/k, so::

      k_hat   = pi / (sd(ln x) * sqrt(6))
      lam_hat = exp( mean(ln x) + gamma / k_hat )    (gamma = Euler)

  shape < 1 = bursty/clustered arrivals (heavier-than-exponential),
  shape ≈ 1 = Poisson, shape > 1 = regular/machine-paced — the single
  number that separates organic traffic from a cron job.
- ``l_moments``: sample L-moments (Hosking 1990) l1, l2 and the
  ratios L-CV, L-skewness, L-kurtosis — the ORDER-STATISTICS shape
  profile. Classical skew/kurtosis (moments_profile) cube and fourth-
  power the data, so one wild row owns the answer at 100 TB;
  L-moments are LINEAR in the sorted sample (finite under any
  distribution with a mean, bounded |t3|,|t4| < 1) and the standard
  basis for regional distribution identification. From the
  probability-weighted moments::

      b_k = mean over i of x_(i) * C(i-1, k) / C(n-1, k)
      l1 = b0,  l2 = 2 b1 - b0,
      l3 = 6 b2 - 6 b1 + b0,  l4 = 20 b3 - 30 b2 + 12 b1 - b0

  with x_(1) <= ... <= x_(n) ascending.

Reference parity: the reference models per-series behavior with HTM;
these are the distribution-identification re-expressions over the
same per-series streams (htm_streamer/model.py per-series scoring).

Scale notes: weibull_gaps is one per-entity lag window (the accepted
hot-entity serial bound shared with likelihood) collapsing to
combinable log power sums. l_moments is one per-group sort window
producing ranks, then ONE combinable aggregate — the binomial weights
are per-row expressions of (rank, n), never a pairwise join.
"""

from __future__ import annotations

from math import pi, sqrt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["weibull_gaps", "l_moments", "nb_overdispersion"]

_EULER = 0.57721566490153286554


def _r6(c):
    return F.round(c + F.lit(1e-9), 6)


def weibull_gaps(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    ts_col: str = "ts",
    *,
    order_cols: tuple = (),
) -> DataFrame:
    """Per-group Weibull(shape, scale) fit of the positive per-entity
    inter-arrival gaps (seconds), via log-moments. Gaps are computed
    WITHIN each entity's ordered stream, pooled per group — the same
    gap population exp_interarrival_ks tests. Zero gaps (duplicate
    timestamps) are excluded (ln undefined); groups with < 3 positive
    gaps or zero log-variance report NULL fit with n_gaps intact.

    Returns ``(group, n_gaps, shape, scale, mean_gap)``, 6 dp.
    """
    g = group_col
    w = Window.partitionBy(g, entity_col).orderBy(ts_col, *order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = ((us - F.lag(us).over(w)) / 1e6).alias("_gap")
    gaps = (
        df.select(F.col(g), F.col(entity_col), F.col(ts_col), *[F.col(c) for c in order_cols])
        .select(F.col(g), gap)
        .where(F.col("_gap") > 0)
    )
    ln = F.log(F.col("_gap"))
    agg = gaps.groupBy(g).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum(ln).alias("_s1"),
        F.sum(ln * ln).alias("_s2"),
        F.avg("_gap").alias("_mg"),
    )
    n = F.col("n_gaps").cast("double")
    mean_ln = F.col("_s1") / n
    # try_divide: a 1-gap group must yield NULL fit, not an ANSI
    # divide-by-zero (the ok gate itself evaluates sd_ln)
    var_ln = F.try_divide(
        F.col("_s2") - F.col("_s1") * F.col("_s1") / n, n - 1
    )
    sd_ln = F.sqrt(F.greatest(var_ln, F.lit(0.0)))
    shape = F.lit(pi / sqrt(6.0)) / sd_ln
    scale = F.exp(mean_ln + F.lit(_EULER) / shape)
    ok = (F.col("n_gaps") >= 3) & (sd_ln > 0)
    return agg.select(
        g,
        "n_gaps",
        _r6(F.when(ok, shape)).alias("shape"),
        _r6(F.when(ok, scale)).alias("scale"),
        _r6(F.col("_mg")).alias("mean_gap"),
    )


def l_moments(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Per-group sample L-moments and ratios: ``(group, n_rows, l1,
    l2, l_cv, l_skew, l_kurt)``, 6 dp — the outlier-robust shape
    profile (linear in the order statistics; |l_skew|, |l_kurt| < 1
    always, unlike classical skew/kurtosis which one wild row owns).

    ``l_cv = l2/l1`` is NULL when l1 == 0; ratios are NULL when
    l2 == 0 (constant column) or n < 4 (b3 undefined). NULLs in the
    value column are excluded. One per-group sort window (ascending
    value, ties in arbitrary order — L-moments are symmetric in tied
    values so the tie order is irrelevant) then one combinable
    aggregate; the binomial weights are per-row expressions.
    """
    g = group_col
    base = df.select(
        F.col(g), F.col(value_col).cast("double").alias("_x")
    ).where(F.col(value_col).isNotNull())
    w = Window.partitionBy(g).orderBy("_x")
    i = F.row_number().over(w).cast("double")
    ranked = base.select(F.col(g), F.col("_x"), i.alias("_i"))
    n = F.count(F.lit(1)).over(Window.partitionBy(g)).cast("double")
    # probability-weighted moments: b_k = mean( x_(i) * prod_{j=1..k}
    # (i-j)/(n-j) ) — the C(i-1,k)/C(n-1,k) ratio in product form
    # (avoids factorial overflow at any n)
    r = ranked.select(
        F.col(g),
        "_x",
        "_i",
        F.count(F.lit(1)).over(Window.partitionBy(g)).cast("double").alias("_n"),
    )
    # try_divide: groups too small for a weight (n <= k) go NULL and
    # are gated NULL downstream anyway (ANSI mode forbids plain x/0)
    t1 = F.try_divide(F.col("_i") - 1, F.col("_n") - 1)
    t2 = F.try_divide(F.col("_i") - 2, F.col("_n") - 2)
    t3 = F.try_divide(F.col("_i") - 3, F.col("_n") - 3)
    agg = r.groupBy(g).agg(
        F.max("_n").cast("long").alias("n_rows"),
        F.avg("_x").alias("_b0"),
        F.avg(F.col("_x") * t1).alias("_b1"),
        F.avg(F.col("_x") * t1 * t2).alias("_b2"),
        F.avg(F.col("_x") * t1 * t2 * t3).alias("_b3"),
    )
    l1 = F.col("_b0")
    l2 = 2 * F.col("_b1") - F.col("_b0")
    l3 = 6 * F.col("_b2") - 6 * F.col("_b1") + F.col("_b0")
    l4 = 20 * F.col("_b3") - 30 * F.col("_b2") + 12 * F.col("_b1") - F.col("_b0")
    ok = F.col("n_rows") >= 4
    return agg.select(
        g,
        "n_rows",
        _r6(l1).alias("l1"),
        _r6(F.when(ok, l2)).alias("l2"),
        _r6(F.when(ok & (l1 != 0), F.try_divide(l2, l1))).alias("l_cv"),
        _r6(F.when(ok & (l2 != 0), F.try_divide(l3, l2))).alias("l_skew"),
        _r6(F.when(ok & (l2 != 0), F.try_divide(l4, l2))).alias("l_kurt"),
    )


def nb_overdispersion(
    df: DataFrame,
    group_col: str,
    entity_col: str,
) -> DataFrame:
    """Per-group negative-binomial fit of the per-entity event counts
    by method of moments — the PARAMETRIC twin of
    ``stattests.dispersion_index``: Fano says the counts are
    overdispersed; NB(r, p) says by how much and in what shape::

        m = mean(count),  v = var(count)        (observed entities)
        p = m / v,        r = m^2 / (v - m)     (MOM; v > m required)
        pred_zero = (r / (r + m)) ^ r           (NB-implied P(count=0))

    Small r = a few heavy entities dominate (bursty, bot-like); large
    r → Poisson. ``pred_zero`` is the zero-truncation diagnostic: the
    fit sees only entities with >= 1 event, so a pred_zero far above 0
    means the visible counts imply many silent entities — population
    undercount. Underdispersed groups (v <= m) report NULL r/p
    (Poisson or better — NB undefined), counts intact.

    Plan: one combinable ``groupBy(group, entity)`` count collapse,
    then power sums over the entity frame — two shuffles, the second
    over entity-count rows. Returns ``(group, n_entities, mean_cnt,
    var_cnt, fano, r, p, pred_zero)``, 6 dp.
    """
    g = group_col
    ent = df.groupBy(g, F.col(entity_col).alias("_e")).agg(
        F.count(F.lit(1)).cast("double").alias("_c")
    )
    agg = ent.groupBy(g).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_c").alias("_s1"),
        F.sum(F.col("_c") * F.col("_c")).alias("_s2"),
    )
    n = F.col("_n")
    m = F.col("_s1") / n
    v = F.try_divide(F.col("_s2") - F.col("_s1") * F.col("_s1") / n, n - 1)
    over = v > m
    r = F.when(over, m * m / (v - m))
    p = F.when(over, m / v)
    pred_zero = F.when(over, F.pow(r / (r + m), r))
    return agg.select(
        g,
        n.cast("long").alias("n_entities"),
        _r6(m).alias("mean_cnt"),
        _r6(v).alias("var_cnt"),
        _r6(F.try_divide(v, m)).alias("fano"),
        _r6(r).alias("r"),
        _r6(p).alias("p"),
        _r6(pred_zero).alias("pred_zero"),
    )
