"""Deterministic Poisson bootstrap — distributed uncertainty for the
validator's point estimates.

Every profile statistic the engine reports (means, rates, drift
scores) is a point estimate with no error bar; the reference's stats
are the same (htm_streamer/validation.py min/max/mean profiling). The
classical bootstrap cannot run distributed — resampling n rows WITH
replacement needs global coordination — but the POISSON bootstrap
(Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012; equivalently Owen & Eckles 2012) replaces the
multinomial(n, 1/n) resample counts with iid Poisson(1) weights per
row per replicate. Each row decides its own weight in every replicate
locally, so B replicate estimates cost ONE map-side-combinable pass —
the only bootstrap shape that survives 100 TB.

Determinism: the Poisson draw for (row b) is NOT random state — it is
a pure function of the row id: u = md5(id || ':' || b) first 8 hex
digits / 2^32, then w = #{k : u >= CDF_k} with the Poisson(1) CDF
thresholds as literals. Any engine reproduces the exact integer
weights (the DuckDB oracle recomputes them bit-identically), reruns
are stable, and partitioning cannot change the answer.

Scale notes: ONE scan of the fact table; the 2B+2 aggregates (per
replicate: sum(w*x), sum(w)) all combine map-side, so the shuffle
carries |groups| rows of 2B doubles. The replicate-mean frame is
|groups| x B rows — metadata-sized — and the percentile window runs
there, never on the fact table. No collect, no Python in the plan.
The md5-per-(row, replicate) hashing is the dominant map cost
(B hashes/row, all inside whole-stage codegen); u is materialized in
its own projection so the threshold comparisons reference a column,
not B x 9 re-evaluated hash subtrees (see memory: CollapseProject
keeps expensive multi-referenced aliases separate).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["POISSON1_CDF", "poisson_bootstrap_mean_ci"]

# Poisson(1) CDF thresholds P(X <= k), k = 0..8: a hashed uniform u
# maps to weight w = #{k : u >= CDF_k} (so u < CDF_0 -> 0, ... ,
# u >= CDF_8 -> 9; P(X > 8) ~ 1.1e-7, truncation is immaterial).
# Literal doubles shared verbatim with the oracle SQL.
POISSON1_CDF = []
_acc, _term = 0.0, math.exp(-1.0)
for _k in range(9):
    _acc += _term
    POISSON1_CDF.append(_acc)
    _term /= _k + 1


def _u_expr(id_col: str, b: int):
    """Uniform in [0, 1) from md5(id:b) — first 8 hex digits as an
    exact 32-bit integer over 2^32 (both steps exact in binary
    floating point, so any engine reproduces the double bitwise)."""
    key = F.concat(
        F.col(id_col).cast("string"), F.lit(":"), F.lit(str(b))
    )
    return (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )


def poisson_bootstrap_mean_ci(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    *,
    n_replicas: int = 48,
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Per-group mean of ``value_col`` with a Poisson-bootstrap
    percentile confidence interval.

    Returns (group, n, mean, n_boot, boot_se, ci_lo, ci_hi):
    ``n_boot`` replicates (a replicate whose total weight is 0 — only
    possible for tiny groups — is dropped), ``boot_se`` the sample
    stddev of the replicate means, and [ci_lo, ci_hi] the
    (alpha/2, 1-alpha/2) percentile interval with exact linear
    interpolation over the B replicate means.
    """
    if n_replicas < 2:
        raise ValueError("n_replicas must be >= 2")
    if not 0.0 < alpha < 1.0:
        raise ValueError("alpha must be in (0, 1)")

    # Stage 1: one hash per (row, replicate), each u its own alias so
    # stage 2's nine threshold comparisons reference a column. The
    # narrow (group, value, id) projection is fanned out first: the B
    # md5 hashes per row are the dominant cost and inherit the scan's
    # split count — a single-row-group input file serializes them onto
    # one core (guide §2.5 input skew; measured 39.6s -> 3.7s at sf1.0
    # local[32]). No-op when the scan already carries >= parallelism
    # splits, i.e. at real scale.
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    with_u = fan_out_narrow_scans(df.select(group_col, value_col, id_col)).select(
        group_col,
        value_col,
        *[_u_expr(id_col, b).alias(f"u_{b}") for b in range(n_replicas)],
    )
    def _weight(b: int):
        # flat sum of 9 comparisons, NOT size(filter(array, ...)):
        # higher-order array functions are interpreted (no whole-stage
        # codegen), and B of them per row dominated the runtime — the
        # explicit sum stays inside codegen (measured ~5x on sf0.1)
        u = F.col(f"u_{b}")
        w = None
        for c in POISSON1_CDF:
            term = (u >= F.lit(c)).cast("int")
            w = term if w is None else w + term
        return w.cast("double").alias(f"w_{b}")

    with_w = with_u.select(
        group_col, value_col, *[_weight(b) for b in range(n_replicas)]
    )

    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.avg(value_col).alias("mean"),
    ]
    for b in range(n_replicas):
        aggs.append(
            F.sum(F.col(f"w_{b}") * F.col(value_col)).alias(f"swx_{b}")
        )
        aggs.append(F.sum(F.col(f"w_{b}")).alias(f"sw_{b}"))
    per_group = with_w.groupBy(group_col).agg(*aggs)

    # Replicate means: |groups| x B rows — metadata-sized from here on.
    means = F.array(
        *[
            F.when(
                F.col(f"sw_{b}") > 0, F.col(f"swx_{b}") / F.col(f"sw_{b}")
            )
            for b in range(n_replicas)
        ]
    )
    replicate = per_group.select(
        group_col, "n", "mean", F.explode(means).alias("mean_b")
    ).filter(F.col("mean_b").isNotNull())

    return (
        replicate.groupBy(group_col, "n", "mean")
        .agg(
            F.count(F.lit(1)).alias("n_boot"),
            F.stddev_samp("mean_b").alias("se_raw"),
            F.percentile("mean_b", F.lit(alpha / 2.0)).alias("lo_raw"),
            F.percentile("mean_b", F.lit(1.0 - alpha / 2.0)).alias(
                "hi_raw"
            ),
        )
        .select(
            group_col,
            "n",
            # +1e-9 nudge matches the oracle convention (half-up vs
            # half-even rounding divergence at exact .5 boundaries)
            F.round(F.col("mean") + F.lit(1e-9), round_to).alias("mean"),
            "n_boot",
            F.round(F.col("se_raw") + F.lit(1e-9), round_to).alias(
                "boot_se"
            ),
            F.round(F.col("lo_raw") + F.lit(1e-9), round_to).alias(
                "ci_lo"
            ),
            F.round(F.col("hi_raw") + F.lit(1e-9), round_to).alias(
                "ci_hi"
            ),
        )
    )
