"""Extreme-value diagnostics — the OUTLIER half of the anomaly
battery (operators/stattests.py holds the change-point/trend half,
operators/conformal.py the distribution-free gating half).

- Iterative extreme-studentized-deviate (ESD) peeling, the Rosner
  (1983) mechanic: repeatedly remove the single most extreme point by
  |x - mean| / sd, recomputing mean/sd after each removal — the
  masking-proof refinement of the plain max-|z| Grubbs check (one
  giant outlier inflates sd and hides the second-worst; peeling
  unmasks it). The validator's "which exact rows poison this column"
  answer, complementing the population-level gates (KS/PSI drift,
  conformal p-values) with named row verdicts — the same role the
  reference's per-row anomaly score plays in htm_streamer/model.py,
  reinterpreted as a batch column check.
- Hill (1975) tail-index estimator over a positive size column: the
  heavy-tail EXPONENT alpha from the top-k order statistics,
  H = (1/k) * sum_{i<=k} ln(x_(i) / x_(k+1)), alpha = 1/H. A corpus
  whose document-length alpha drifts below ~1-2 has developed a
  pathological long tail (truncation failures, concatenated crawl
  blobs) long before the mean moves — the tail-focused complement to
  the Zipf rank-frequency fit (operators/lm.py) which reads the HEAD.

Scale notes: ESD is ``rounds`` combinable aggregations over ONE
persisted narrow frame (group, id, x) — the per-round argmax is a
``max_by`` aggregation, not a sort window, so no per-group serial
sort; removals are broadcast anti-join keys (<= rounds * n_groups
rows, metadata-scale). Moments come from explicit power sums so the
DuckDB oracle reproduces the arithmetic bitwise up to summation
rounding. Hill is one per-group top-(k+1) sort window (the same
accepted hot-group bound as operators/likelihood.py) over the rows
that survive a pushed-down positivity filter.
"""

from __future__ import annotations

from math import log, pi, sqrt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["esd_peel", "gumbel_maxima", "hill_tail", "tukey_fences"]


def _r6(col):
    # +1e-9 half-up nudge, matching the oracle rounding convention.
    return F.round(col + F.lit(1e-9), 6)


def esd_peel(
    df: DataFrame,
    group_col: str,
    id_col: str,
    value_col: str,
    *,
    rounds: int = 3,
    z_crit: float = 3.0,
) -> DataFrame:
    """Per-group iterative ESD outlier peeling: ``rounds`` times,
    report and remove the row with the largest |x - mean| / sd
    (sample sd via power sums), recomputing moments on the survivors.

    Ties on the deviation break toward the SMALLEST id (exact: the
    comparison tuple is (|dev| rounded to 9 dp, -id), so both engines
    pick the same row even at float ties). ``r_stat`` is compared to
    the caller's fixed ``z_crit`` (default 3.0) rather than the exact
    Rosner t-quantile lambda — the t inverse is not expressible in
    either engine's SQL surface; callers wanting exact lambda gate the
    returned statistic themselves. Groups that run out of rows
    (n <= 2 would make sd degenerate) stop peeling early.

    Returns one row per (group, round): (group, round, n_before,
    out_id, out_value, r_stat, exceeds), r_stat at 6 dp.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    g = group_col
    # fan out BEFORE the persist: the cache inherits the scan's split
    # count, and every round's aggregation/argmax re-reads the cached
    # partitions — a single-row-group input would pin all 'rounds'
    # passes to one core (guide §2.5; no-op at real scale)
    frame = fan_out_narrow_scans(
        df.select(
            F.col(g), F.col(id_col).alias("_id"), F.col(value_col).cast("double").alias("_x")
        ).where(F.col(value_col).isNotNull())
    )
    frame = frame.persist()  # 'rounds' aggregations, one fact scan
    out = None
    for rnd in range(1, rounds + 1):
        moms = frame.groupBy(g).agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum("_x").alias("_s1"),
            F.sum(F.col("_x") * F.col("_x")).alias("_s2"),
        )
        scored = frame.join(F.broadcast(moms), g)
        mean = F.col("_s1") / F.col("_n")
        var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / F.col("_n")) / (
            F.col("_n") - 1
        )
        dev = F.abs(F.col("_x") - mean)
        # argmax by (rounded |dev|, smallest id): combinable max_by, no
        # per-group sort window. Rounding the comparator to 9 dp keeps
        # the Spark and DuckDB argmax choices identical at float ties.
        pick = scored.where(F.col("_n") >= F.lit(3)).groupBy(g).agg(
            F.max_by(
                F.struct(
                    F.col("_id").alias("out_id"),
                    F.col("_x").alias("out_value"),
                    dev.alias("_dev"),
                    F.col("_n").alias("_nb"),
                    F.sqrt(F.greatest(var, F.lit(0.0))).alias("_sd"),
                ),
                F.struct(F.round(dev, 9), -F.col("_id")),
            ).alias("_w")
        )
        row = pick.select(
            F.col(g),
            F.lit(rnd).cast("int").alias("round"),
            F.col("_w.out_id").alias("out_id"),
            F.col("_w.out_value").alias("out_value"),
            F.col("_w._nb").alias("n_before"),
            F.when(
                F.col("_w._sd") > 0, _r6(F.col("_w._dev") / F.col("_w._sd"))
            ).alias("r_stat"),
        )
        row = row.withColumn(
            "exceeds",
            F.when(F.col("r_stat") > F.lit(z_crit), F.lit(1))
            .otherwise(F.lit(0))
            .cast("int"),
        )
        out = row if out is None else out.unionByName(row)
        if rnd < rounds:
            removed = row.select(F.col(g), F.col("out_id").alias("_id"))
            frame = frame.join(F.broadcast(removed), [g, "_id"], "left_anti")
    return out.select(
        g, "round", "n_before", "out_id", "out_value", "r_stat", "exceeds"
    )


def hill_tail(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: int = 50,
) -> DataFrame:
    """Per-group Hill tail-index estimate from the top-``k`` order
    statistics of a positive column::

        H     = (1/k) * sum_{i=1..k} ln( x_(i) / x_(k+1) )
        alpha = 1 / H,     se(alpha) ~= alpha / sqrt(k)

    where x_(1) >= x_(2) >= ... are the descending order statistics.
    Rows with x <= 0 are excluded BEFORE ranking (pushed-down filter).
    Groups with fewer than k+1 positive rows, or a degenerate H == 0
    (top k+1 values all equal), report NULL alpha/se with n_pos still
    populated. Returns (group, n_pos, hill_h, alpha, se), 6 dp.

    Ties among order statistics don't disturb the estimate (equal
    values contribute identical log-ratios regardless of rank order),
    so row_number's arbitrary tie order is safe on the VALUE sum; the
    denominator x_(k+1) is a value, not a row.
    """
    g = group_col
    pos = df.select(F.col(g), F.col(value_col).cast("double").alias("_x")).where(
        F.col(value_col) > 0
    )
    w = Window.partitionBy(g).orderBy(F.col("_x").desc())
    # n_pos rides the SAME partitioning as the rank window — one
    # shuffle+sort, one fact scan, no second aggregation pass.
    ranked = pos.select(
        F.col(g),
        "_x",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(g)).alias("_np"),
    ).where(F.col("_rn") <= k + 1)
    ranked = ranked.persist()  # x_(k+1) lookup + log-ratio sum share it
    xk1 = ranked.where(F.col("_rn") == k + 1).select(
        F.col(g), F.col("_x").alias("_xk1")
    )
    n_pos = ranked.groupBy(g).agg(F.max("_np").cast("long").alias("n_pos"))
    h = (
        ranked.where(F.col("_rn") <= k)
        .join(F.broadcast(xk1), g)
        .groupBy(g)
        .agg(F.avg(F.log(F.col("_x") / F.col("_xk1"))).alias("_h"))
    )
    out = n_pos.join(h, g, "left")
    alpha = F.when(F.col("_h") > 0, 1.0 / F.col("_h"))
    return out.select(
        g,
        "n_pos",
        _r6(F.col("_h")).alias("hill_h"),
        _r6(alpha).alias("alpha"),
        _r6(alpha / F.sqrt(F.lit(float(k)))).alias("se"),
    )


def tukey_fences(
    df: DataFrame,
    group_col: str,
    value_col: str,
    *,
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey box-plot fences and the rows outside them —
    the QUARTILE member of the outlier family: ESD assumes roughly
    Gaussian bulk and names individual rows; the fences are
    distribution-agnostic bounds (breakdown point 25%) that a skewed
    or heavy-tailed column doesn't fool, the standard "how much of
    this feed is junk" gate::

        lo = Q1 - k * IQR,   hi = Q3 + k * IQR    (k = 1.5 Tukey 1977)

    Quartiles are exact type-7 (linear interpolation) — Spark
    ``percentile`` and DuckDB ``quantile_cont`` agree on the
    definition, so the oracle reproduces the bounds bitwise. NULLs are
    excluded; groups need n >= 4 for meaningful quartiles but any
    n >= 1 is reported (fences of a tiny group are still defined).

    Plan: ONE persisted narrow (group, x) frame feeds both the
    quartile aggregate (combinable sketch-free exact percentile — one
    shuffle) and the fence-count pass; fences join back via broadcast
    (|groups| rows, metadata-scale). Returns ``(group, n_rows, q1,
    q3, iqr, lo_fence, hi_fence, n_below, n_above, pct_out)``, 6 dp.
    """
    g = group_col
    base = df.select(
        F.col(g), F.col(value_col).cast("double").alias("_x")
    ).where(F.col(value_col).isNotNull())
    base = base.persist()  # quartiles + the count pass share one scan
    quart = base.groupBy(g).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.percentile("_x", 0.25).alias("_q1"),
        F.percentile("_x", 0.75).alias("_q3"),
    )
    iqr = F.col("_q3") - F.col("_q1")
    fences = quart.select(
        g,
        "n_rows",
        "_q1",
        "_q3",
        (F.col("_q1") - F.lit(k) * iqr).alias("_lo"),
        (F.col("_q3") + F.lit(k) * iqr).alias("_hi"),
    )
    counted = (
        base.join(F.broadcast(fences), g)
        .groupBy(g)
        .agg(
            F.first("n_rows").alias("n_rows"),
            F.first("_q1").alias("_q1"),
            F.first("_q3").alias("_q3"),
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.sum(F.when(F.col("_x") < F.col("_lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col("_x") > F.col("_hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )
    r6 = lambda c: F.round(c + F.lit(1e-9), 6)  # noqa: E731
    return counted.select(
        g,
        "n_rows",
        r6(F.col("_q1")).alias("q1"),
        r6(F.col("_q3")).alias("q3"),
        r6(F.col("_q3") - F.col("_q1")).alias("iqr"),
        r6(F.col("_lo")).alias("lo_fence"),
        r6(F.col("_hi")).alias("hi_fence"),
        "n_below",
        "n_above",
        r6(
            (F.col("n_below") + F.col("n_above")) / F.col("n_rows")
        ).alias("pct_out"),
    )


def gumbel_maxima(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    value_col: str,
    *,
    bucket: str = "day",
    return_periods: tuple[int, int] = (30, 365),
) -> DataFrame:
    """Per-group Gumbel (EV-I) fit over BLOCK MAXIMA — classical
    extreme-value theory's answer to "how bad can a daily peak get":
    by Fisher–Tippett, maxima of light-tailed blocks converge to
    Gumbel, so the per-``bucket`` maxima of a value column support
    return-level extrapolation BEYOND the observed range::

        scale = sd * sqrt(6) / pi            (method of moments)
        loc   = mean - gamma * scale         (gamma = Euler-Mascheroni)
        x_T   = loc - scale * ln(-ln(1 - 1/T))   (T-block return level)

    The complement to ``hill_tail``: Hill reads the tail EXPONENT of
    all rows (heavy-tail diagnosis); Gumbel reads block PEAKS and
    answers capacity questions ("the value a 365-day horizon exceeds
    once, in expectation"). Moments use power sums so the oracle
    reproduces the arithmetic; groups with < 3 blocks report NULL fit
    (sd undefined / meaningless).

    Plan: one ``groupBy(group, bucket)`` max (combinable, map-side
    partial) collapses the fact table to the blocks frame; the fit is
    one aggregate over it. Returns ``(group, n_blocks, block_max_mean,
    loc, scale, rl_lo, rl_hi, max_observed)``, 6 dp, where rl_lo/rl_hi
    are the return levels at ``return_periods``.
    """
    g = group_col
    euler_gamma = 0.57721566490153286554
    blocks = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(g), F.date_trunc(bucket, F.col(ts_col)).alias("_b"))
        .agg(F.max(F.col(value_col).cast("double")).alias("_m"))
    )
    agg = blocks.groupBy(g).agg(
        F.count(F.lit(1)).cast("long").alias("n_blocks"),
        F.sum("_m").alias("_s1"),
        F.sum(F.col("_m") * F.col("_m")).alias("_s2"),
        F.max("_m").alias("_mx"),
    )
    n = F.col("n_blocks").cast("double")
    mean = F.col("_s1") / n
    var = (F.col("_s2") - F.col("_s1") * F.col("_s1") / n) / (n - 1)
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    scale = sd * F.lit(sqrt(6.0) / pi)
    loc = mean - F.lit(euler_gamma) * scale
    def rl(T: int):
        return loc - scale * F.lit(log(-log(1.0 - 1.0 / T)))
    ok = F.col("n_blocks") >= 3
    r6 = lambda c: F.round(c + F.lit(1e-9), 6)  # noqa: E731
    return agg.select(
        g,
        "n_blocks",
        r6(mean).alias("block_max_mean"),
        r6(F.when(ok, loc)).alias("loc"),
        r6(F.when(ok, scale)).alias("scale"),
        r6(F.when(ok, rl(return_periods[0]))).alias("rl_lo"),
        r6(F.when(ok, rl(return_periods[1]))).alias("rl_hi"),
        r6(F.col("_mx")).alias("max_observed"),
    )
