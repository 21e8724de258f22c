"""Kaplan-Meier survival estimation over inter-event gaps — the
censoring-correct member of the retention family.

``cohort_retention`` (operators/funnel.py driver query) answers "what
fraction of a cohort came back in week k" but silently treats users
whose observation window ended as churned. The KM estimator handles
RIGHT-CENSORING properly: a user's final gap (last event -> end of
observation) is known only to EXCEED its duration, so it keeps the
subject in the risk set up to that duration and contributes no death.
Naive retention underestimates survival exactly where the data is
newest — the bias KM exists to remove.

``S(t) = prod over event times t_i <= t of (1 - d_i / n_i)`` where
``d_i`` = completed gaps of duration exactly t_i and ``n_i`` = gaps
(complete or censored) with duration >= t_i.

Scale notes (100 TB):
- One window pass (lead per (group, entity)) over the fact table
  produces the durations; everything after operates on the
  ``groupBy(group, duration)`` collapsed frame — distinct-duration-
  sized (the curve itself), never the fact table. Deployments with
  near-continuous timestamps should pass ``round_to`` to bucket
  durations, which bounds the curve frame explicitly.
- The risk set needs no self-join: with per-duration counts m,
  ``n_risk(t) = N_group - (cum_count(<t))`` comes from one ordered
  cumulative window on the collapsed frame, and the KM product is
  ``exp`` of the same window's cumulative ``ln(1 - d/n)`` sum —
  ordered cumulative sums are deterministic, so the float arithmetic
  reproduces across engines (6-dp rounded like everything else).
- The observation end is the global ``max(ts)`` (a one-row broadcast
  derived from the same persisted narrow frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gap_durations(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    ts_col: str,
    round_to: int,
    extra_cols: tuple = (),
) -> DataFrame:
    """Shared duration derivation for the survival family: per-entity
    consecutive-event gaps, right-censored at the global max(ts), in
    integer seconds floored to ``round_to``-second buckets. One
    persisted narrow scan; ``extra_cols`` rides additional columns
    (e.g. a sample class for ``logrank_test``) through the window.
    Returns (group, *extra_cols, _t, _ev)."""
    g = group_col
    w = Window.partitionBy(g, entity_col).orderBy(ts_col)
    # persist the narrow projection: the observation-end aggregate and
    # the gap window both derive from it — one fact scan
    narrow = df.select(g, entity_col, ts_col, *extra_cols).persist()
    # extra_cols may be aliased expressions over df's columns — after
    # the narrow projection they exist only by NAME
    extra_names = narrow.columns[3:]
    end = narrow.agg(F.max(ts_col).alias("_end")).withColumn(
        "_j", F.lit(1)
    )
    raw = (
        narrow.select(
            g,
            *extra_names,
            F.col(ts_col).alias("_ts"),
            F.lead(ts_col).over(w).alias("_nxt"),
        )
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(end), "_j")
    )
    # exact integer microsecond arithmetic: unix_timestamp() TRUNCATES
    # sub-second components (and DuckDB's epoch()::BIGINT rounds), so
    # second-level functions disagree across engines on real-world
    # fractional timestamps — micros don't. timestampdiff works on
    # both TIMESTAMP and TIMESTAMP_NTZ (parquet scans read NTZ).
    return raw.select(
        g,
        *extra_names,
        (
            F.expr("timestampdiff(MICROSECOND, _ts, coalesce(_nxt, _end))")
            / F.lit(round_to * 1_000_000)
        )
        .cast("long")
        .alias("_t"),
        F.col("_nxt").isNotNull().cast("int").alias("_ev"),
    ).select(
        g, *extra_names, (F.col("_t") * round_to).alias("_t"), "_ev"
    )


def km_survival(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    ts_col: str,
    *,
    round_to: int = 1,
) -> DataFrame:
    """Per-group Kaplan-Meier survival curve of the gap between an
    entity's consecutive events, right-censored at the global
    observation end (``max(ts_col)`` over the input).

    Durations are integer seconds floored to ``round_to``-second
    buckets (1 = no bucketing). The curve has one row per distinct
    completed-gap duration, in increasing order; censored-only
    durations shape the risk set but emit no row (survival only drops
    at event times — the classical step function). ``survival`` is 0
    from the point where the last at-risk gaps all complete
    (``d == n_risk``). Returns
    (group, duration_s, n_risk, n_events, survival), 6 dp.
    """
    g = group_col
    dur = _gap_durations(df, g, entity_col, ts_col, round_to)
    gt = dur.groupBy(g, "_t").agg(
        F.sum("_ev").cast("long").alias("_d"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    wg = Window.partitionBy(g)
    wo = Window.partitionBy(g).orderBy("_t")
    rk = gt.select(
        g,
        "_t",
        "_d",
        "_m",
        F.sum("_m").over(wo).alias("_cle"),
        F.sum("_m").over(wg).alias("_ng"),
    )
    ev = rk.where(F.col("_d") > 0).select(
        g,
        "_t",
        "_d",
        (F.col("_ng") - (F.col("_cle") - F.col("_m"))).alias("_nrisk"),
    )
    wk = Window.partitionBy(g).orderBy("_t")
    hit0 = F.max(
        (F.col("_d") >= F.col("_nrisk")).cast("int")
    ).over(wk)
    lnsum = F.sum(
        F.when(
            F.col("_d") < F.col("_nrisk"),
            F.log(F.lit(1.0) - F.col("_d") / F.col("_nrisk")),
        )
    ).over(wk)
    return ev.select(
        g,
        F.col("_t").alias("duration_s"),
        F.col("_nrisk").alias("n_risk"),
        F.col("_d").alias("n_events"),
        F.round(
            F.when(hit0 == 1, F.lit(0.0)).otherwise(F.exp(lnsum))
            + F.lit(1e-9),
            6,
        ).alias("survival"),
    )


def logrank_test(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    ts_col: str,
    sample_col: str,
    *,
    a_value=0,
    round_to: int = 1,
    alpha_chi2: float = 3.841458820694124,
) -> DataFrame:
    """Per-group two-sample LOG-RANK test of the gap-survival curves —
    the inferential member of the survival family: ``km_survival``
    draws the censoring-correct curve, the log-rank test answers "are
    these two curves the same?" with censoring handled exactly (the
    question naive retention comparisons get wrong in the same place
    naive retention gets the curve wrong — the newest, most-censored
    data). Entities with ``sample_col = a_value`` form sample A, all
    others B; the Mantel–Haenszel form over pooled distinct completed-
    gap times::

        O_A = sum_i d_Ai
        E_A = sum_i d_i * n_Ai / n_i
        V   = sum_i d_i * (n_Ai/n_i) * (1 - n_Ai/n_i)
                      * (n_i - d_i) / (n_i - 1)    (n_i > 1)
        chi2 = (O_A - E_A)^2 / V,  1 df, reject at 3.8415 (5%)

    with d = deaths (completed gaps) and n = at-risk (duration >= t,
    censored included) — the hypergeometric conditional variance.

    Plan: inherits the one persisted narrow scan from
    ``_gap_durations`` (the sample class rides the same window pass);
    everything after is the ``groupBy(group, duration)`` collapsed
    frame with BOTH classes folded as conditional aggregates, so the
    per-class risk sets are two ordered cumulative windows on ONE
    frame — no per-class union, no self-join, no dense grid. Ordered
    cumsums are deterministic; counts are integers. Degenerate groups
    (a class with no gaps, or V <= 0) report NULLs. Returns
    (group, n_a, n_b, o_a, e_a, logrank_chi2, lr_reject), 6 dp.
    """
    g = group_col
    is_a = (F.col(sample_col) == F.lit(a_value)).cast("int").alias("_ia")
    dur = _gap_durations(
        df, g, entity_col, ts_col, round_to, extra_cols=(is_a,)
    )
    gt = dur.groupBy(g, "_t").agg(
        F.sum(F.when(F.col("_ia") == 1, F.col("_ev"))).alias("_da"),
        F.sum("_ev").cast("long").alias("_d"),
        F.sum("_ia").cast("long").alias("_ma"),
        F.count(F.lit(1)).cast("long").alias("_m"),
    )
    wg = Window.partitionBy(g)
    wo = (
        Window.partitionBy(g)
        .orderBy("_t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    rk = gt.select(
        g,
        "_t",
        "_da",
        "_d",
        (
            F.sum("_ma").over(wg)
            - (F.sum("_ma").over(wo) - F.col("_ma"))
        ).alias("_na"),
        (
            F.sum("_m").over(wg)
            - (F.sum("_m").over(wo) - F.col("_m"))
        ).alias("_n"),
        F.sum("_ma").over(wg).alias("_tot_a"),
        (F.sum("_m").over(wg) - F.sum("_ma").over(wg)).alias("_tot_b"),
    )
    ev = rk.where(F.col("_d") > 0)
    na = F.col("_na").cast("double")
    nn = F.col("_n").cast("double")
    dd = F.col("_d").cast("double")
    p = na / nn
    agg = ev.groupBy(g).agg(
        F.max("_tot_a").alias("n_a"),
        F.max("_tot_b").alias("n_b"),
        F.sum("_da").cast("long").alias("o_a"),
        F.sum(dd * p).alias("_ea"),
        F.sum(
            F.when(
                F.col("_n") > 1,
                dd * p * (1.0 - p) * (nn - dd) / (nn - 1.0),
            )
        ).alias("_v"),
    )
    diff = F.col("o_a").cast("double") - F.col("_ea")
    chi2 = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (F.col("_v") > 0),
        diff * diff / F.col("_v"),
    )
    return agg.select(
        g,
        "n_a",
        "n_b",
        "o_a",
        F.round(F.col("_ea") + F.lit(1e-9), 6).alias("e_a"),
        F.round(chi2 + F.lit(1e-9), 6).alias("logrank_chi2"),
        F.when(chi2.isNotNull(), chi2 > alpha_chi2).alias("lr_reject"),
    )
