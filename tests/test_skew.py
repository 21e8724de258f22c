"""Skew handling: the salted uniqueness aggregation must return exact
counts when one key carries 50% of all rows (the north rule's hot-key
scenario; FIXTURES.md dup_doc_id skew fixture at larger scale)."""

from __future__ import annotations

from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig
from htm_streamer_spark.operators.uniqueness import duplicate_ids, duplicate_violations


def test_hot_key_exact_counts(spark):
    n, hot = 400_000, 200_000
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("doc-hot"))
        .otherwise(F.concat(F.lit("doc-"), F.col("id")))
        .alias("doc_id"),
        (F.col("id") % 64).cast("int").alias("part_id"),
    )
    # plant one small duplicate group besides the hot key
    extra = spark.range(3).select(
        F.lit("doc-pair").alias("doc_id"), F.lit(0).cast("int").alias("part_id")
    )
    df = df.unionByName(extra)
    dups = {r["doc_id"]: r["dup_cnt"] for r in duplicate_ids(df, EngineConfig()).collect()}
    assert dups == {"doc-hot": hot, "doc-pair": 3}


def test_hot_key_violation_rows_complete(spark):
    n, hot = 100_000, 50_000
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("doc-hot"))
        .otherwise(F.concat(F.lit("doc-"), F.col("id")))
        .alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("part_id"),
    )
    v = duplicate_violations(df, EngineConfig())
    assert v.count() == hot  # every copy of the hot key flagged
    assert v.select("doc_id").distinct().count() == 1


def test_asof_hot_key_single_window_pass(spark):
    """As-of join with ONE key owning 10^5 rows: the union-sort plan
    must stay one exchange + one running-state window (O(n) in the hot
    partition — the accepted serial bound documented in operators/asof),
    and must NEVER degenerate into a per-key range/cross join (which
    would be |L|x|R| = 10^10 comparisons here and not finish)."""
    from htm_streamer_spark.operators.asof import asof_join

    n_left, every = 100_000, 10
    left = spark.range(n_left).select(
        F.lit("hot").alias("k"),
        F.col("id").cast("long").alias("ts"),
        F.col("id").alias("event_id"),
    )
    right = (
        spark.range(n_left // every)
        .select(
            F.lit("hot").alias("k"),
            (F.col("id") * every).cast("long").alias("ts"),
            (F.col("id") * 1000).alias("price"),
        )
    )
    out = asof_join(left, right, "k", "ts", ["price"])

    import io
    import re
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()

    assert not re.search(r"CartesianProduct|BroadcastNestedLoopJoin|SortMergeJoin", plan)
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
    assert n_exchanges == 1, plan

    rows = out.collect()
    assert len(rows) == n_left
    # every left ts picks the latest right at-or-before: floor(ts/10)*1000
    for r in rows[:: max(1, n_left // 500)]:
        assert r["asof_price"] == (r["ts"] // every) * 1000
