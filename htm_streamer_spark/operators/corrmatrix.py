"""One-pass Pearson correlation matrix over numeric columns.

Profiling the relationships between a table's numeric columns
(redundant features, broken derivations like price≈qty×unit_price,
drifted couplings) needs all C(k,2) pairwise correlations — and the
naive loop of ``df.stat.corr(a, b)`` runs one JOB PER PAIR, k² scans
of a 100 TB table. Every pairwise Pearson r is a function of power
sums (Σx, Σx², Σxy per pair), all of which fit in ONE combinable
aggregation: k(k+3)/2 + 1 conditional sums, one scan, one reduce
round — identical cost at any row count beyond the scan itself.

Rows where EITHER column of a pair is null are excluded from that
pair (pairwise deletion, each pair over its own complete rows) by
null-masking inside the sums, so one sparse column doesn't poison the
others. Population-vs-sample normalization cancels in r; the formula
is pinned from raw moments so any engine reproduces it bit-for-bit
(the same reasoning as the moments_profile operator — engine corr()
built-ins disagree on degenerate cases).

Degenerate pairs (either side constant → zero variance) return NULL,
not a crash and not a fake 0 — "no linear relationship is defined"
is different from "uncorrelated".

Reference analog: the reference profiles columns independently
(htm_streamer/validation.py per-feature min/max); cross-column
structure is the part a single-pass distributed profile adds.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["correlation_matrix"]


def correlation_matrix(
    df: DataFrame, cols: Sequence[str], round_to: int | None = None
) -> DataFrame:
    """(col_a, col_b, n, r) for every unordered pair of ``cols`` —
    one aggregation pass, pairwise-complete rows, NULL r on zero
    variance."""
    aggs = []
    for a, b in combinations(cols, 2):
        xa, xb = F.col(a).cast("double"), F.col(b).cast("double")
        both = xa.isNotNull() & xb.isNotNull()
        ma = F.when(both, xa)  # NULL outside the pair's complete rows
        mb = F.when(both, xb)
        tag = f"{a}__{b}"
        aggs += [
            F.count(ma).alias(f"n_{tag}"),
            F.sum(ma).alias(f"sx_{tag}"),
            F.sum(mb).alias(f"sy_{tag}"),
            F.sum(ma * ma).alias(f"sxx_{tag}"),
            F.sum(mb * mb).alias(f"syy_{tag}"),
            F.sum(ma * mb).alias(f"sxy_{tag}"),
        ]
    row = df.agg(*aggs)
    pairs = []
    for a, b in combinations(cols, 2):
        tag = f"{a}__{b}"
        n = F.col(f"n_{tag}").cast("double")
        sx, sy = F.col(f"sx_{tag}"), F.col(f"sy_{tag}")
        sxx, syy, sxy = (
            F.col(f"sxx_{tag}"),
            F.col(f"syy_{tag}"),
            F.col(f"sxy_{tag}"),
        )
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        r = F.when((n >= 2) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
        if round_to is not None:
            # +1e-12 nudges off half-even boundaries so two engines'
            # last-ulp differences round alike; +0.0 folds -0.0 → 0.0
            r = F.round(r + F.lit(1e-12), round_to) + F.lit(0.0)
        pairs.append(
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"n_{tag}").alias("n"),
                r.alias("r"),
            )
        )
    return row.select(F.explode(F.array(*pairs)).alias("p")).select(
        "p.col_a", "p.col_b", "p.n", "p.r"
    )
