"""As-of join: for each left row, the single most recent right row
at-or-before its timestamp per key — the time-series join every
feature/label pipeline needs (point-in-time-correct attribution, no
leakage from the future).

Spark-first shape — the UNION-SORT formulation, not a per-key
collect or a range cross-join:

    tag both sides, unionByName, ONE shuffle+sort on
    (key, ts, side), then `last(<right cols>, ignorenulls=True)` over
    rows UNBOUNDED PRECEDING..CURRENT carries the latest right row
    forward onto every left row.

Cost: a single exchange of |L|+|R| narrow rows and one sort — the
same asymptotics as a merge join, and the window is the running-state
kind Spark executes in O(n) per partition (no per-row rescans). A
naive `L JOIN R ON l.key = r.key AND r.ts <= l.ts` + argmax is a
range join that degenerates to |L|×|R| per key; this never does.

Tie rule: a right row at exactly l.ts IS visible (at-or-before), so
right sorts before left at equal ts (side 0 < side 1). Right-side
duplicates at the same (key, ts) are resolved deterministically by the
caller-supplied dedup (keep the max-`seq_col` row) before the union —
without it, "the" most recent row is ambiguous on any engine.

Skew bound (accepted, same as the likelihood operator's per-series
bound): all rows of one key land in one window task and are processed
serially in O(n) — a key owning 10^5 rows completes in a single
exchange + one running-state pass, never a per-key range join;
evidenced live by tests/test_skew.py::test_asof_hot_key_single_window_pass
(plan asserted: exactly 1 Exchange, no Cartesian/NestedLoop/SortMerge
join). A key too hot for one task would need key-range chunking with
boundary carry-over — out of scope until a real workload shows one.

DuckDB oracle: native `ASOF JOIN` (same at-or-before semantics), see
__spark_entry__.SQL_ASOF_JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    seq_col: str | None = None,
) -> DataFrame:
    """Left rows + the latest right row's ``right_cols`` at-or-before
    each left ts (null when no prior right row exists).

    ``seq_col``: a right-side column whose max breaks ties among right
    rows sharing (key, ts); required if such duplicates can exist.
    """
    if seq_col is not None:
        w_dedup = Window.partitionBy(key_col, ts_col).orderBy(F.desc(seq_col))
        right = (
            right.withColumn("_rn", F.row_number().over(w_dedup))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    left_cols = left.columns
    # the right payload rides as ONE struct so the last() carry is
    # atomic — carrying columns independently would stitch together
    # DIFFERENT right rows whenever a right column is legitimately null
    r_struct_t = (
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in right_cols
        ) + ">"
    )
    tagged_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols
          if c not in (key_col, ts_col)],
    )
    tagged_l = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r_struct_t).alias("_r"),
        *[F.col(c) for c in left_cols if c not in (key_col, ts_col)],
    )
    u = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select("*", F.last("_r", ignorenulls=True).over(w).alias("_asof"))
    return carried.filter(F.col("_side") == 1).select(
        key_col,
        ts_col,
        *[c for c in left_cols if c not in (key_col, ts_col)],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )
