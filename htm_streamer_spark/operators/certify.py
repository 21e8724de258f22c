"""Sampling-based validation certificates: probabilistic guarantees on
violation rates WITHOUT scanning the whole table.

At 10^12 rows even a single full-scan validation pass is a budget
decision. A deterministic hash sample plus a Hoeffding bound turns a
cheap pass over r% of the data into a certificate: "with confidence
1-delta, the true violation rate of every check is below its
``upper_bound``". The full-scan suite (operators/invariants.py +
plans/validation_plan.py) stays the authoritative gate — this operator
is the triage tier that decides which snapshots/partitions are worth
the full pass, the same cheap-first stance as the reference's sampling
phase (it estimates encoder ranges from the first K rows before
committing to the full run: /root/reference/htm_streamer/config/
config.py:178-196).

Design notes:
- The sample is a DETERMINISTIC md5 bucket of the id column — the same
  engine-portable recipe as the split/shuffle operators (a rerun, a
  resumed run, and the DuckDB oracle all sample the identical rows;
  rand() would certify a different subsample every run).
- Hoeffding's inequality needs no variance estimate and holds for any
  bounded indicator, so the bound is valid at ANY sample size —
  smaller samples just certify looser bounds. One-sided:
  ``ub = v/n + sqrt(ln(1/delta) / (2n))``.
- Plan: the sample predicate and every check indicator are codegen
  expressions inside ONE scan; a single aggregation emits all check
  counters; the per-check unpivot (``stack``) runs on a 1-row frame.
  No shuffle carries more than one counter row.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["violation_rate_certificate"]


def violation_rate_certificate(
    df: DataFrame,
    checks: dict[str, Column],
    *,
    id_col: str = "doc_id",
    sample_permille: int = 200,
    delta: float = 0.01,
) -> DataFrame:
    """One row per check: (check_id, n_sampled, n_violations, rate,
    upper_bound) where ``upper_bound`` is the one-sided Hoeffding
    (1-delta)-confidence bound on the TRUE violation rate, computed
    from a deterministic md5 hash sample of ``sample_permille``/1000
    of the rows.

    ``checks`` maps check_id -> boolean violation Column (same
    contract as the row-check registry). Empty sample (n=0) yields a
    NULL rate/bound rather than a division error.
    """
    if not 0 < sample_permille <= 1000:
        raise ValueError(f"sample_permille must be in (0, 1000], got {sample_permille}")
    if not 0 < delta < 1:
        raise ValueError(f"delta must be in (0, 1), got {delta}")
    from htm_streamer_spark.operators.dedup import shingle_base_hash

    bucket = F.pmod(
        shingle_base_hash(F.col(id_col).cast("string"), "md5"), F.lit(1000)
    )
    sampled = df.where(bucket < sample_permille)
    names = list(checks)
    agg = sampled.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        *[
            F.sum(checks[k].cast("long")).cast("long").alias(f"_v{i}")
            for i, k in enumerate(names)
        ],
    )
    pairs = ", ".join(f"'{k}', _v{i}" for i, k in enumerate(names))
    stacked = agg.select(
        "_n", F.expr(f"stack({len(names)}, {pairs}) as (check_id, _v)")
    )
    # ln(1/delta)/(2n) under a sqrt — plain arithmetic on the 1-row
    # frame; the constant folds at plan time
    slack = F.sqrt(F.lit(math.log(1.0 / delta)) / (2.0 * F.col("_n")))
    rate = F.col("_v") / F.col("_n")
    return stacked.select(
        "check_id",
        F.col("_n").alias("n_sampled"),
        F.coalesce(F.col("_v"), F.lit(0)).alias("n_violations"),
        F.when(F.col("_n") > 0, F.round(rate + F.lit(1e-9), 6)).alias("rate"),
        F.when(
            F.col("_n") > 0,
            F.round(F.least(rate + slack, F.lit(1.0)) + F.lit(1e-9), 6),
        ).alias("upper_bound"),
    )
