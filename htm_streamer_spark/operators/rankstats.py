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

from htm_streamer_spark.operators.stattests import _CHI2_95

__all__ = [
    "spearman_corr",
    "mann_whitney_u",
    "kruskal_wallis",
    "brown_forsythe",
    "anderson_darling_k",
]


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


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    class_col: str,
) -> DataFrame:
    """Kruskal–Wallis H per group: the K-SAMPLE extension of the
    two-sample battery (MWU/KS/CvM/energy all compare exactly two
    samples; a corpus sliced by source has k of them, and running
    k(k-1)/2 pairwise tests both loses power and multiplies the FDR
    problem ``holm_stepdown`` exists to fix). H asks once: "do the k
    classes share one value distribution, against location shifts?"

    Textbook tie-corrected form over pooled midranks::

        H  = 12 / (N (N+1)) * sum_j R_j^2 / n_j  -  3 (N + 1)
        C  = 1 - sum(t^3 - t) / (N^3 - N)        (t = tie-bucket size)
        Hc = H / C,   reject at Hc > chi2_{0.95, k-1}

    Midranks and the tie sum use the same per-row identities as
    ``mann_whitney_u`` (rank + (tie-1)/2; each tie row contributes
    t^2 - 1) — exact half-integer arithmetic, engine-agnostic. The
    chi-square verdict is a literal df -> critical-value ladder for
    k - 1 in 1..30 (NULL beyond — at that many classes the caller
    should model, not gate). Degenerate groups (k < 2, or every
    pooled value tied: C <= 0) report NULL H.

    Plan: one exchange partitions by group (both rank windows and
    both re-aggregations are subset-key clustered on it); the class
    and group reductions are map-side combinable. Per-group sort is
    the accepted hot-group bound. Returns
    (group, n, k, h_stat, kw_reject), 6 dp.
    """
    g = group_col
    ranked = df.where(F.col(value_col).isNotNull()).select(
        g,
        F.col(class_col).alias("_cls"),
        _avg_rank(g, value_col).alias("_r"),
        F.count(F.lit(1))
        .over(Window.partitionBy(g, value_col))
        .alias("_t"),
    )
    per_cls = ranked.groupBy(g, "_cls").agg(
        F.count(F.lit(1)).alias("_nj"),
        F.sum("_r").alias("_rj"),
        F.sum(F.col("_t").cast("double") * F.col("_t") - 1.0).alias(
            "_ties"
        ),
    )
    agg = per_cls.groupBy(g).agg(
        F.sum("_nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("_rj") * F.col("_rj") / F.col("_nj")).alias("_rsum"),
        F.sum("_ties").alias("_ts"),
    )
    nn = F.col("n").cast("double")
    h = 12.0 / (nn * (nn + 1.0)) * F.col("_rsum") - 3.0 * (nn + 1.0)
    c = 1.0 - F.col("_ts") / (nn * nn * nn - nn)
    hc = F.when((F.col("k") > 1) & (c > 0), h / c)
    crit = F.lit(None).cast("double")
    for dof, cv in _CHI2_95.items():
        crit = F.when(F.col("k") - 1 == dof, F.lit(cv)).otherwise(crit)
    return agg.select(
        g,
        "n",
        "k",
        F.round(hc + F.lit(1e-9), 6).alias("h_stat"),
        F.when(hc.isNotNull() & crit.isNotNull(), hc > crit).alias(
            "kw_reject"
        ),
    )


def brown_forsythe(
    df: DataFrame,
    group_col: str,
    value_col: str,
    class_col: str,
) -> DataFrame:
    """Brown–Forsythe (median-based Levene) variance-homogeneity test
    per group: the SCALE member of the k-sample family —
    ``kruskal_wallis`` detects location shifts across the k classes,
    Brown–Forsythe detects a class whose SPREAD changed (a source
    whose doc-length variance exploded is mixing two populations even
    if its median held). One-way ANOVA F on the absolute deviations
    from each class's median::

        z_ij = |x_ij - median_j|
        W = (N-k)/(k-1) * sum_j n_j (zbar_j - zbar)^2
                        / sum_ij (z_ij - zbar_j)^2

    with the large-N verdict ``(k-1) W > chi2_{0.95, k-1}`` (the
    numerator's asymptotic law; exact F quantiles have no closed
    form — df are reported so a caller can apply exact tables).

    Determinism: the median is pinned to "average of the two middle
    order statistics", computed from cumulative weights on the
    tie-collapsed (class, value, count) frame — identical in any
    engine, no percentile-implementation drift. All sums afterwards
    are weighted power sums on that collapsed frame.

    Plan: ONE fact scan — the ``groupBy(group, class, value)``
    tie-collapse is the only full-data shuffle; the median window,
    join-back (broadcast: |classes| rows), and both reductions run on
    the collapsed frame. Degenerate groups (k < 2, N <= k, or zero
    within-class deviation SS) report NULL W. Returns
    (group, n, k, bf_stat, bf_reject), 6 dp.
    """
    g = group_col
    collapsed = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(g, F.col(class_col).alias("_cls"), F.col(value_col).alias("_v"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # collapsed feeds BOTH the median derivation and the deviation
    # join — persist it so the fact table is scanned once
    collapsed = collapsed.persist()
    cum_w = (
        Window.partitionBy(g, "_cls")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(g, "_cls")
    with_cum = collapsed.select(
        g,
        "_cls",
        "_v",
        "_c",
        F.sum("_c").over(cum_w).alias("_cum"),
        F.sum("_c").over(tot_w).alias("_nj"),
    )
    # median = avg of the two middle order stats: lo = first value
    # whose cumulative count reaches ceil(Nj/2), hi = first reaching
    # floor(Nj/2)+1 (equal when Nj is odd)
    med = with_cum.groupBy(g, "_cls").agg(
        F.min(
            F.when(
                F.col("_cum") >= F.ceil(F.col("_nj") / 2), F.col("_v")
            )
        ).alias("_lo"),
        F.min(
            F.when(
                F.col("_cum") >= F.floor(F.col("_nj") / 2) + 1,
                F.col("_v"),
            )
        ).alias("_hi"),
    )
    dev = collapsed.join(F.broadcast(med), [g, "_cls"]).select(
        g,
        "_cls",
        "_c",
        F.abs(
            F.col("_v").cast("double")
            - (F.col("_lo") + F.col("_hi")) / 2.0
        ).alias("_z"),
    )
    per_cls = dev.groupBy(g, "_cls").agg(
        F.sum("_c").alias("_nj"),
        F.sum(F.col("_c") * F.col("_z")).alias("_sz"),
        F.sum(F.col("_c") * F.col("_z") * F.col("_z")).alias("_szz"),
    )
    agg = per_cls.groupBy(g).agg(
        F.sum("_nj").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.col("_sz") * F.col("_sz") / F.col("_nj")).alias("_b"),
        F.sum("_sz").alias("_szt"),
        F.sum(F.col("_szz") - F.col("_sz") * F.col("_sz") / F.col("_nj"))
        .alias("_ssw"),
    )
    nn = F.col("n").cast("double")
    kk = F.col("k").cast("double")
    ssb = F.col("_b") - F.col("_szt") * F.col("_szt") / nn
    w = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (F.col("_ssw") > 0),
        (nn - kk) / (kk - 1.0) * ssb / F.col("_ssw"),
    )
    crit = F.lit(None).cast("double")
    for dof, cv in _CHI2_95.items():
        crit = F.when(F.col("k") - 1 == dof, F.lit(cv)).otherwise(crit)
    return agg.select(
        g,
        "n",
        "k",
        F.round(w + F.lit(1e-9), 6).alias("bf_stat"),
        F.when(
            w.isNotNull() & crit.isNotNull(),
            (kk - 1.0) * w > crit,
        ).alias("bf_reject"),
    )


def anderson_darling_k(
    df: DataFrame,
    group_col: str,
    value_col: str,
    class_col: str,
    *,
    chunk: int = 100_000,
) -> DataFrame:
    """k-sample Anderson-Darling test per group (Scholz & Stephens
    1987, the tie-aware midrank form A2akN): the k-sample OMNIBUS
    member of the battery — ``kruskal_wallis`` sees only location
    shifts and ``brown_forsythe`` only scale; AD weights the ECDF
    discrepancy by 1/(F(1-F)) so tail differences between sources
    count, answering "do the k classes share ONE value distribution,
    against any alternative". Over distinct pooled values z_i with
    multiplicity l_i (B_i = cumcount - l_i/2; M_ij = per-class
    cumcount - f_ij/2)::

        A2 = (N-1)/N sum_j 1/n_j sum_i (l_i/N)
                 (N M_ij - n_j B_i)^2 / (B_i (N - B_i) - N l_i / 4)

    standardized by the exact null moments (E = k-1; sigma^2 from the
    published 4-coefficient formula in N, k, H = sum 1/n_j, the
    harmonic sum h = H_{N-1} and the double harmonic sum
    g = sum_{i<=N-2} (H_{N-1} - H_i)/(N - i)), with the 5% verdict
    T > 1.645 + 0.678/sqrt(m) - 0.362/m at m = k-1 (the standard
    interpolated critical surface).

    Plan: ONE fact shuffle (the (group, class, value) tie-collapse);
    everything after runs on collapsed frames — the L x k evaluation
    grid is (distinct values) x (classes), never the fact table. The
    harmonic sums depend on (N, k) ONLY: they are generated from a
    chunked integer sequence (arrays capped at ``chunk`` elements, so
    no 10^9-element literal array at corpus scale) and reduced with
    one per-group window — metadata-scale work relative to the scan.
    Degenerate groups (k < 2, a single distinct pooled value, or
    N < 4, where the variance formula's (N-1)(N-2)(N-3) denominator
    vanishes) report NULL. Returns
    (group, n, k, a2_stat, t_stat, ad_reject), 6 dp.
    """
    g = group_col
    collapsed = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            g,
            F.col(class_col).alias("_cls"),
            F.col(value_col).alias("_v"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("_f"))
    )
    collapsed = collapsed.persist()  # pooled + classes + grid join
    pooled = collapsed.groupBy(g, "_v").agg(F.sum("_f").alias("_l"))
    cum_v = (
        Window.partitionBy(g)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pooled = pooled.select(
        g,
        "_v",
        "_l",
        (F.sum("_l").over(cum_v) - F.col("_l") / 2.0).alias("_B"),
        F.sum("_l").over(Window.partitionBy(g)).alias("_N"),
        F.count(F.lit(1)).over(Window.partitionBy(g)).alias("_nd"),
    )
    classes = collapsed.groupBy(g, "_cls").agg(F.sum("_f").alias("_nj"))
    grid = pooled.join(classes, [g]).join(
        collapsed, [g, "_cls", "_v"], "left"
    ).fillna({"_f": 0.0})
    cum_cls = (
        Window.partitionBy(g, "_cls")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m_ij = F.sum("_f").over(cum_cls) - F.col("_f") / 2.0
    nn = F.col("_N")
    den = F.col("_B") * (nn - F.col("_B")) - nn * F.col("_l") / 4.0
    inner = (
        (F.col("_l") / nn)
        * F.pow(nn * m_ij - F.col("_nj") * F.col("_B"), 2)
        / den
    )
    scored = grid.select(
        g,
        "_cls",
        "_nj",
        "_N",
        "_nd",
        F.when(den > 0, inner).alias("_inner"),
    )
    per_cls = scored.groupBy(g, "_cls").agg(
        F.min("_N").alias("_N"),
        F.min("_nd").alias("_nd"),
        (F.sum("_inner") / F.min("_nj")).alias("_acls"),
        (1.0 / F.min("_nj")).alias("_hj"),
    )
    stats = per_cls.groupBy(g).agg(
        F.min("_N").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.min("_nd").cast("long").alias("_nd"),
        F.sum("_acls").alias("_a2raw"),
        F.sum("_hj").alias("_hsum"),
    )
    # harmonic sums h = H_{N-1}, gsum = sum_{i<=N-2} (h - H_i)/(N - i):
    # chunked sequence explode (arrays <= `chunk`), one ordered window.
    nmax = F.col("n") - 1
    chunks = stats.where(F.col("n") >= 4).select(
        g,
        "n",
        F.explode(
            F.sequence(
                F.lit(0), F.floor((nmax - 1) / F.lit(chunk)).cast("int")
            )
        ).alias("_ch"),
    )
    ints = chunks.select(
        g,
        "n",
        F.explode(
            F.sequence(
                F.col("_ch").cast("long") * chunk + 1,
                F.least(
                    (F.col("_ch").cast("long") + 1) * chunk, nmax
                ),
            )
        ).alias("_i"),
    )
    cum_i = (
        Window.partitionBy(g)
        .orderBy("_i")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hi = F.sum(1.0 / F.col("_i")).over(cum_i)
    htot = F.sum(1.0 / F.col("_i")).over(Window.partitionBy(g))
    terms = ints.select(
        g,
        htot.alias("_h"),
        F.when(
            F.col("_i") <= F.col("n") - 2,
            (htot - hi) / (F.col("n") - F.col("_i")),
        ).alias("_gt"),
    )
    harm = terms.groupBy(g).agg(
        F.min("_h").alias("_h"),
        F.coalesce(F.sum("_gt"), F.lit(0.0)).alias("_g"),
    )
    out = stats.join(harm, [g], "left")
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    h_ = F.col("_h")
    g_ = F.col("_g")
    hh = F.col("_hsum")
    a2 = (nd - 1.0) / nd * F.col("_a2raw")
    a = (4.0 * g_ - 6.0) * (kd - 1.0) + (10.0 - 6.0 * g_) * hh
    b = (
        (2.0 * g_ - 4.0) * kd * kd
        + 8.0 * h_ * kd
        + (2.0 * g_ - 14.0 * h_ - 4.0) * hh
        - 8.0 * h_
        + 4.0 * g_
        - 6.0
    )
    c = (
        (6.0 * h_ + 2.0 * g_ - 2.0) * kd * kd
        + (4.0 * h_ - 4.0 * g_ + 6.0) * kd
        + (2.0 * h_ - 6.0) * hh
        + 4.0 * h_
    )
    d = (2.0 * h_ + 6.0) * kd * kd - 4.0 * h_ * kd
    var = (a * nd * nd * nd + b * nd * nd + c * nd + d) / (
        (nd - 1.0) * (nd - 2.0) * (nd - 3.0)
    )
    ok = (
        (F.col("k") >= 2)
        & (F.col("_nd") >= 2)
        & (F.col("n") >= 4)
        & (var > 0)
    )
    t = F.when(ok, (a2 - (kd - 1.0)) / F.sqrt(var))
    m = kd - 1.0
    crit = 1.645 + 0.678 / F.sqrt(m) - 0.362 / m
    return out.select(
        g,
        "n",
        "k",
        F.round(F.when(ok, a2) + F.lit(1e-9), 6).alias("a2_stat"),
        F.round(t + F.lit(1e-9), 6).alias("t_stat"),
        F.when(t.isNotNull(), t > crit).alias("ad_reject"),
    )
