"""Runtime Bloom-filter join reduction (plans/runtime_filters.py):
the injected might_contain prunes the fact scan, and the join answer
is byte-identical with and without the filter."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from htm_streamer_spark.plans.runtime_filters import runtime_bloom

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _join(spark):
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 4).alias("s"),
        )
    )


def test_bloom_filter_injected_and_answer_unchanged(spark):
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        baseline = _join(spark)
        base_plan = _plan(baseline)
        assert "might_contain" not in base_plan  # default thresholds: off at test scale
        want = baseline.collect()

        with runtime_bloom(spark):
            filtered = _join(spark)
            plan = _plan(filtered)
            # the dim side aggregates a bloom; the FACT scan applies it
            assert "bloom_filter_agg" in plan
            assert "might_contain" in plan
            scan_filter = [
                ln for ln in plan.splitlines()
                if "might_contain" in ln and "l_orderkey" in ln
            ]
            assert scan_filter, "filter must target the fact side's key"
            assert filtered.collect() == want

        # scope ends: thresholds restored, filter gone again
        assert "might_contain" not in _plan(_join(spark))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
