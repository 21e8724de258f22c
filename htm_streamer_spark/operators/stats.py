"""Fused per-partition statistics — the engine's single-scan pass.

The reference walks the data once per model accumulating min/max samples
(/root/reference/htm_streamer/config/config.py:178-196) and separately
counts predictions/synapses per step. Here ALL per-column stats and ALL
row-level invariant counts for every partition come out of ONE
``groupBy(part_id).agg(...)`` over one parquet scan (SURVEY.md §4.2's
"multi-check single-scan fusion" — the engine's main optimizer decision).

Every aggregate used is partial-merge capable (min/max/count/sum/avg/
approx_count_distinct), so map-side combine reduces the shuffle to
``n_partitions × 1`` rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig
from htm_streamer_spark.operators.invariants import row_check_exprs


def partition_stats(df: DataFrame, cfg: EngineConfig, featurized: bool = False) -> DataFrame:
    """One row per part_id with column stats + per-check violation counts.

    Columns: part_id, n_rows, n_tok_min, n_tok_max, n_tok_null_rate,
    n_tok_avg, approx_distinct_source, n_<check> per enabled row check,
    n_row_violations.
    """
    exprs = row_check_exprs(cfg, featurized)
    tok_len = F.col("tok_len") if featurized else F.size("tokens")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("n_tok").alias("n_tok_min"),
        F.max("n_tok").alias("n_tok_max"),
        F.avg(F.col("n_tok").isNull().cast("double")).alias("n_tok_null_rate"),
        F.avg("n_tok").alias("n_tok_avg"),
        F.sum(tok_len.cast("long")).alias("total_tokens"),
        F.approx_count_distinct("source").alias("approx_distinct_source"),
    ]
    any_v = None
    for name, e in exprs.items():
        aggs.append(F.sum(e.cast("long")).alias(f"n_{name}"))
        any_v = e if any_v is None else (any_v | e)
    aggs.append(
        F.sum((any_v if any_v is not None else F.lit(False)).cast("long")).alias(
            "n_rows_flagged"
        )
    )
    return df.groupBy("part_id").agg(*aggs)


def column_profile(df: DataFrame, cfg: EngineConfig) -> DataFrame:
    """Whole-table column profile (global analog of partition_stats;
    reference analog: the sampling-phase min/max that seeds encoder ranges,
    config/config.py:64-72). Single global agg — partial-merged, constant
    output size."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("n_tok").alias("n_tok_min"),
        F.max("n_tok").alias("n_tok_max"),
        F.avg(F.col("n_tok").isNull().cast("double")).alias("n_tok_null_rate"),
        F.percentile_approx("n_tok", [0.5, 0.95, 0.99], 10000).alias("n_tok_pcts"),
        F.approx_count_distinct("doc_id").alias("approx_distinct_doc_id"),
        F.approx_count_distinct("source").alias("approx_distinct_source"),
    )
