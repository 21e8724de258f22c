"""Pareto frontier (2-D skyline) — efficient-frontier data selection.

Training-data curation constantly trades off per-document metrics
(longer vs more lexically diverse, higher quality vs rarer source);
a fixed threshold on either axis discards the documents that are
excellent on the other. The skyline keeps exactly the non-dominated
rows: p survives unless some q is >= on BOTH axes and > on at least
one (the standard skyline-operator semantics, Börzsönyi et al. 2001).
The reference engine has no counterpart — this extends its per-column
min/max profiling (htm_streamer/validation.py) to the cross-column
selection question.

Scale notes: the naive skyline is an O(n^2) self-join; the 2-D case
collapses to sorting. We aggregate max(y) per distinct x (ONE
map-side-combinable shuffle of (x, y) pairs — the fact table's other
columns never shuffle), take a running max over distinct-x rows in
descending x (the frame is |distinct x| rows — value-domain-sized,
NOT row-count-sized), and broadcast-join the verdict back to the fact
rows: p is dominated iff max(y over x' > x) >= y_p or max(y at the
same x) > y_p. No collect, no Python, and ties on both coordinates
are all retained (equal points do not dominate each other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pareto_frontier"]


def pareto_frontier(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Rows of ``df`` not dominated under maximize-(x, y).

    Returns (id_col, x_col, y_col) for every surviving row (duplicate
    coordinates all survive together). NULL coordinates are excluded —
    a NULL axis cannot be compared, so such rows neither dominate nor
    survive."""
    pts = df.select(id_col, x_col, y_col).filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    )
    per_x = pts.groupBy(x_col).agg(F.max(y_col).alias("_max_y"))
    # global window over DISTINCT x values only — value-domain-sized
    above = Window.orderBy(F.col(x_col).desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    verdict = per_x.select(
        x_col,
        "_max_y",
        F.max("_max_y").over(above).alias("_best_above"),
    )
    return (
        pts.join(F.broadcast(verdict), x_col)
        .filter(
            (F.col(y_col) == F.col("_max_y"))
            & (
                F.col("_best_above").isNull()
                | (F.col(y_col) > F.col("_best_above"))
            )
        )
        .select(id_col, x_col, y_col)
    )
