"""Score-vs-label evaluation — does a scoring column actually separate
a binary outcome?

The engine ships many per-row scores (likelihood, quality, conformal
p-values; reference scorer: htm_streamer/utils/anomaly.py) and several
binary outcomes (violation flags, drift verdicts). This operator is
the missing MODEL-EVAL member: given (score, label) it reports

- AUC by the exact midrank (Mann-Whitney) identity — the probability
  a random positive outscores a random negative, ties counted half;
  identical to the trapezoidal area under the tie-aware ROC curve,
- its Hanley-McNeil (1982) standard error, and
- the Youden-optimal operating point: the threshold t maximizing
  J = TPR - FPR over "predict positive iff score >= t", with TPR/FPR
  at that threshold (J's max equals the one-sided KS distance between
  the class-conditional score distributions).

Scale notes: everything runs on the tie-collapsed per-(group, score)
frame — ONE ``groupBy(group, score)`` shuffle of the fact table, then
two per-group ordered windows over DISTINCT scores (the same accepted
hot-group serial bound as ks_two_sample / conformal_pvalues). Midranks
come from the ascending cumulative count, threshold sweeps from the
descending one; no collect, no Python in the plan, AUC and the best
operating point join on the group key (both sides |groups| rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["score_label_eval"]


def score_label_eval(
    df: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
    *,
    round_to: int = 6,
) -> DataFrame:
    """Per-group (n_pos, n_neg, auc, auc_se, best_thr, tpr_best,
    fpr_best, youden_j) for ``score_col`` against the 0/1 (or boolean)
    ``label_col``. Degenerate groups (one class absent) return NULL
    metrics with the counts intact. Rows with a NULL label or score
    are excluded. Best-threshold tie-break is deterministic: highest
    J, then lowest FPR, then highest threshold."""
    lab = F.col(label_col).cast("int")
    cells = (
        df.filter(F.col(score_col).isNotNull() & lab.isNotNull())
        .groupBy(group_col, F.col(score_col).alias("s"))
        .agg(
            F.sum(lab).cast("double").alias("pos_at"),
            (F.count(F.lit(1)) - F.sum(lab)).cast("double").alias("neg_at"),
        )
    )

    asc = Window.partitionBy(group_col).orderBy("s")
    before = asc.rowsBetween(Window.unboundedPreceding, -1)
    desc = Window.partitionBy(group_col).orderBy(F.col("s").desc())
    ge = desc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy(group_col)

    scanned = cells.select(
        group_col,
        "s",
        "pos_at",
        # midrank of this tie bucket = rows strictly below + (size+1)/2
        (
            F.coalesce(F.sum(F.col("pos_at") + F.col("neg_at")).over(before), F.lit(0.0))
            + (F.col("pos_at") + F.col("neg_at") + 1.0) / 2.0
        ).alias("midrank"),
        F.sum("pos_at").over(ge).alias("cum_pos_ge"),
        F.sum("neg_at").over(ge).alias("cum_neg_ge"),
        F.sum("pos_at").over(tot).alias("n_pos"),
        F.sum("neg_at").over(tot).alias("n_neg"),
    )

    # AUC: (sum of positive midranks - n_pos(n_pos+1)/2) / (n_pos n_neg)
    auc_frame = scanned.groupBy(group_col).agg(
        F.sum(F.col("pos_at") * F.col("midrank")).alias("r_pos"),
        F.max("n_pos").alias("n_pos"),
        F.max("n_neg").alias("n_neg"),
    )
    a = F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + 1.0) / 2.0)
        / (F.col("n_pos") * F.col("n_neg")),
    )
    q1 = F.col("auc_raw") / (2.0 - F.col("auc_raw"))
    q2 = 2.0 * F.col("auc_raw") ** 2 / (1.0 + F.col("auc_raw"))
    auc_frame = auc_frame.withColumn("auc_raw", a).withColumn(
        "se_raw",
        F.when(
            F.col("auc_raw").isNotNull(),
            F.sqrt(
                (
                    F.col("auc_raw") * (1.0 - F.col("auc_raw"))
                    + (F.col("n_pos") - 1.0) * (q1 - F.col("auc_raw") ** 2)
                    + (F.col("n_neg") - 1.0) * (q2 - F.col("auc_raw") ** 2)
                )
                / (F.col("n_pos") * F.col("n_neg"))
            ),
        ),
    )

    # Youden sweep: predict positive iff s >= t, t over distinct scores
    swept = scanned.select(
        group_col,
        "s",
        F.when(F.col("n_pos") > 0, F.col("cum_pos_ge") / F.col("n_pos")).alias("tpr"),
        F.when(F.col("n_neg") > 0, F.col("cum_neg_ge") / F.col("n_neg")).alias("fpr"),
    ).withColumn("j", F.col("tpr") - F.col("fpr"))
    pick = Window.partitionBy(group_col).orderBy(
        F.col("j").desc_nulls_last(),
        F.col("fpr").asc_nulls_last(),
        F.col("s").desc(),
    )
    best = (
        swept.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            group_col,
            F.col("s").alias("best_thr"),
            F.col("tpr").alias("tpr_b"),
            F.col("fpr").alias("fpr_b"),
            F.col("j").alias("j_b"),
        )
    )

    # +1e-9 nudge matches the oracle convention (half-up vs half-even
    # rounding divergence at exact .5 boundaries)
    eps = F.lit(1e-9)
    return auc_frame.join(best, group_col).select(
        group_col,
        F.col("n_pos").cast("long").alias("n_pos"),
        F.col("n_neg").cast("long").alias("n_neg"),
        F.round(F.col("auc_raw") + eps, round_to).alias("auc"),
        F.round(F.col("se_raw") + eps, round_to).alias("auc_se"),
        F.round(F.col("best_thr") + eps, round_to).alias("best_thr"),
        F.round(F.col("tpr_b") + eps, round_to).alias("tpr_best"),
        F.round(F.col("fpr_b") + eps, round_to).alias("fpr_best"),
        F.round(F.col("j_b") + eps, round_to).alias("youden_j"),
    )
