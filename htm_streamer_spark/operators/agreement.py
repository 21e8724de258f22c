"""Agreement & calibration diagnostics — do two labelers agree beyond
chance, is a score honest about its own confidence, and does a
categorical stream get STUCK:

- ``cohens_kappa``: chance-corrected agreement between two categorical
  columns (Cohen 1960) — the right readout when comparing a cheap
  heuristic labeler against ground truth (e.g. the n-gram lang-id vs
  the corpus' lang column): raw accuracy flatters any labeler on a
  skewed label mix; kappa subtracts the agreement the marginals alone
  would produce. The chance-corrected twin of the confusion matrix
  (lang_confusion) and of chi-square association (cramers_v measures
  COUPLING of any two categoricals; kappa measures AGREEMENT on a
  shared label space).
- ``calibration_bins``: reliability diagram + Brier decomposition
  inputs for a [0,1] score against a binary outcome — the CALIBRATION
  readout score_label_eval's AUC family cannot give (AUC is invariant
  to any monotone rescaling; a perfectly-discriminating score can
  still lie about its confidence). Equal-width bins; per bin the mean
  score vs observed positive rate, whose gap is the reliability term.
- ``longest_runs``: gaps-and-islands over a categorical stream — the
  named-run complement to the Wald-Wolfowitz runs TEST
  (stattests.runs_test gives an inferential z; this names the longest
  streak and counts runs) — the "stuck sensor / stuck producer"
  validator: a feed that emits the same event_type 500 times in a row
  is broken in a way distribution checks can't see.

Reference parity: the reference's per-row anomaly scores are consumed
by exactly these readouts downstream (NAB scoring joins detections
against labeled windows — driver.py); kappa/calibration are the
batch re-expressions of "is the detector's output trustworthy".

Scale notes: kappa and calibration collapse the fact table with ONE
groupBy each (cells / (group, bin) frames, metadata-sized); marginals
and totals derive from the persisted small frame. longest_runs is one
per-group ordered window (lag + running change-count, the accepted
hot-group serial bound) feeding a combinable per-run count and a
max_by argmax — no per-run sort, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cohens_kappa", "calibration_bins", "longest_runs"]


def _r6(c):
    return F.round(c + F.lit(1e-9), 6)


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Unweighted Cohen's kappa between two categorical columns::

        po    = sum_i p_ii                (observed agreement)
        pe    = sum_i p_a(i) * p_b(i)     (chance agreement)
        kappa = (po - pe) / (1 - pe)      (NULL when pe == 1)

    Rows where either side is NULL are excluded (complete pairs, the
    same contract as mutual_information / cramers_v).
    ``n_categories`` is the size of the UNION label space (a label
    only one rater ever uses still shapes pe through its marginal).

    One ``groupBy(a, b)`` shuffle; marginals, totals and the diagonal
    derive from the persisted cell frame. Returns one row:
    ``(n_rows, n_categories, po, pe, kappa)``, 6 dp.
    """
    cells = (
        df.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .groupBy(F.col(a_col).alias("_a"), F.col(b_col).alias("_b"))
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .persist()
    )
    ma = cells.groupBy("_a").agg(F.sum("_c").alias("_ca"))
    mb = cells.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    # chance agreement pairs the two marginals on the SHARED label
    pe_frame = ma.join(mb, ma["_a"] == mb["_b"]).select(
        (F.col("_ca") * F.col("_cb")).alias("_pp")
    )
    n_cat = (
        cells.select(F.col("_a").alias("_l"))
        .union(cells.select(F.col("_b").alias("_l")))
        .agg(F.count_distinct("_l").cast("long").alias("n_categories"))
    )
    tot = cells.agg(
        F.sum("_c").alias("_n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_c"))).alias("_diag"),
    )
    pe_sum = pe_frame.agg(F.sum("_pp").alias("_spp"))
    j = (
        tot.withColumn("_j", F.lit(1))
        .join(pe_sum.withColumn("_j", F.lit(1)), "_j")
        .join(n_cat.withColumn("_j", F.lit(1)), "_j")
    )
    po = F.coalesce(F.col("_diag"), F.lit(0.0)) / F.col("_n")
    pe = F.coalesce(F.col("_spp"), F.lit(0.0)) / (F.col("_n") * F.col("_n"))
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe))
    return j.select(
        F.col("_n").cast("long").alias("n_rows"),
        "n_categories",
        _r6(po).alias("po"),
        _r6(pe).alias("pe"),
        _r6(kappa).alias("kappa"),
    )


def calibration_bins(
    df: DataFrame,
    group_col: str,
    score_col,
    label_col,
    *,
    n_bins: int = 10,
) -> DataFrame:
    """Per-(group, bin) reliability-diagram cells for a [0,1] score
    against a binary outcome: equal-width bins, ``bin = floor(score *
    n_bins)`` (score == 1 folded into the top bin), each reporting the
    mean score, the observed positive rate, and their absolute gap —
    the per-bin term of ECE (sum of gap * n / N) and the reliability
    term of the Brier decomposition.

    Rows with NULL score or label are excluded; scores outside [0,1]
    raise downstream of nothing — they are clamped into the end bins
    (defensive, documented). ONE groupBy collapses the fact table to
    |groups| x n_bins rows. Returns ``(group, bin, n_rows, mean_score,
    frac_pos, abs_gap)``, 6 dp, ordered semantics left to the caller.
    """
    g = group_col
    s = score_col.cast("double")
    y = F.when(label_col, 1.0).otherwise(0.0)
    b = F.least(
        F.greatest(F.floor(s * n_bins).cast("int"), F.lit(0)),
        F.lit(n_bins - 1),
    )
    agg = (
        df.where(s.isNotNull() & label_col.isNotNull())
        .groupBy(F.col(g), b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.avg(s).alias("_ms"),
            F.avg(y).alias("_fp"),
        )
    )
    return agg.select(
        g,
        "bin",
        "n_rows",
        _r6(F.col("_ms")).alias("mean_score"),
        _r6(F.col("_fp")).alias("frac_pos"),
        _r6(F.abs(F.col("_ms") - F.col("_fp"))).alias("abs_gap"),
    )


def longest_runs(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Per-group runs of CONSECUTIVE EQUAL values of ``value_col`` in
    ``order_cols`` order (gaps-and-islands): how many runs, the
    longest streak, and what value it was stuck on. Ties on run
    length break toward the EARLIEST run (deterministic). NULL values
    form runs of their own kind (a stuck-NULL producer is exactly the
    pathology to catch); fully-NULL order keys are the caller's
    contract to avoid.

    Plan: one per-group ordered window computes the lag-change flag
    and its running sum (run id) in a single pass; per-run lengths are
    a combinable count; the argmax is ``max_by`` on (length, -run_id).
    Returns ``(group, n_rows, n_runs, longest_run, longest_run_value,
    mean_run_len)``, 6 dp on the mean.
    """
    g = group_col
    w = Window.partitionBy(g).orderBy(*order_cols)
    v = F.col(value_col)
    prev = F.lag(value_col).over(w)
    # null-safe change test (eqNullSafe): NULL==NULL extends the run
    changed = F.when(v.eqNullSafe(prev), 0).otherwise(1)
    runs = df.select(
        F.col(g),
        v.alias("_v"),
        F.sum(changed)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("_rid"),
    )
    per_run = runs.groupBy(g, "_rid").agg(
        F.first("_v").alias("_v"), F.count(F.lit(1)).cast("long").alias("_len")
    )
    agg = per_run.groupBy(g).agg(
        F.sum("_len").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_runs"),
        F.max_by(
            F.struct(F.col("_len").alias("l"), F.col("_v").alias("v")),
            F.struct(F.col("_len"), -F.col("_rid")),
        ).alias("_w"),
        F.avg("_len").alias("_mean"),
    )
    return agg.select(
        g,
        "n_rows",
        "n_runs",
        F.col("_w.l").alias("longest_run"),
        F.col("_w.v").alias("longest_run_value"),
        _r6(F.col("_mean")).alias("mean_run_len"),
    )
