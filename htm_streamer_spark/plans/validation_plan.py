"""The validation plan — composes every check into few jobs over one scan.

Batch lifecycle (reference analog: the 3-mode state machine
sampling → initializing → running, /root/reference/htm_streamer/config/
config.py:199-225 and pipeline/htm_stream.py:76-147):

1. *sampling/initializing*: fit baseline histograms on the first K clean
   partitions (≙ the reference accumulating ``features_samples`` then
   deriving encoder ranges, config/config.py:178-196,64-79).
2. *running*: per-partition stats + invariant counts (one fused agg),
   violation rows (one explode pass + salted uniqueness + broadcast
   referential), drift scores vs baseline, verdict assembly with the
   hard-fail override (model/htm_model.py:385-392) and probation
   (anomalylikelihood.py:440-442).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from htm_streamer_spark.config import EngineConfig, validate_input_schema
from htm_streamer_spark.operators.drift import (
    drift_scores,
    featurize_and_token_histogram,
    ntok_histogram,
    token_histogram,
    token_histogram_checked,
)
from htm_streamer_spark.operators.invariants import (
    featurize,
    row_check_flags,
    row_violations,
)
from htm_streamer_spark.operators.referential import dim_sources_df
from htm_streamer_spark.operators.stats import partition_stats
from htm_streamer_spark.operators.uniqueness import duplicate_violations


@dataclass
class ValidationResult:
    verdicts: DataFrame    # part_id, verdict, n_violations, psi, kl
    violations: DataFrame  # doc_id, part_id, check_id, payload
    stats: DataFrame       # per-partition fused stats


def load_sequences(spark: SparkSession, path: str) -> DataFrame:
    """Read the hive-partitioned sequences table and validate its schema
    against the declared StructType (never inferred — reference analog:
    htm_batch_runner.py:66-70)."""
    df = spark.read.parquet(str(path))
    # hive partition column comes back as int; normalize narrow types
    df = df.withColumn("part_id", F.col("part_id").cast("int"))
    validate_input_schema(df.schema)
    return df.select("doc_id", "tokens", "n_tok", "source", "ts", "part_id")


def baseline_part_ids(df: DataFrame, cfg: EngineConfig) -> list[int]:
    """First K distinct part_ids in sort order (metadata-scale action)."""
    rows = df.select("part_id").distinct().sort("part_id").limit(cfg.baseline_partitions).collect()
    return [r[0] for r in rows]


def compute_baseline(
    df: DataFrame, cfg: EngineConfig, base_parts: list[int] | None = None
) -> dict[str, DataFrame]:
    """Baseline token + n_tok histograms over clean rows of the baseline
    partitions. Returns {'tok': DF(bucket,cnt), 'ntok': DF(bucket,cnt),
    'part_ids': list}."""
    if base_parts is None:
        base_parts = baseline_part_ids(df, cfg)
    sub = df.filter(F.col("part_id").isin(base_parts))
    tok = (
        token_histogram_checked(sub, cfg)
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    clean = row_check_flags(featurize(sub, cfg), cfg, featurized=True).filter(
        ~F.col("any_violation")
    )
    ntok = ntok_histogram(clean, cfg).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    return {"tok": tok, "ntok": ntok, "part_ids": base_parts}


def all_violations(
    df: DataFrame, cfg: EngineConfig, featurized: bool = False
) -> DataFrame:
    """Union of row-level + uniqueness violation rows (referential is a
    row-level ``isin`` check by default; see operators/referential.py
    for the dimension-table broadcast form)."""
    parts = [row_violations(df, cfg, featurized)]
    if "dup_doc_id" in cfg.checks:
        parts.append(duplicate_violations(df, cfg))
    if "dup_content" in cfg.checks:
        # opt-in (not in the default tuple): same token array under >=2
        # distinct doc_ids — see operators/uniqueness.py
        from htm_streamer_spark.operators.uniqueness import (
            duplicate_content_violations,
        )

        parts.append(duplicate_content_violations(df, cfg))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_validation_batch(
    spark: SparkSession,
    df: DataFrame,
    cfg: EngineConfig | None = None,
    baseline: dict[str, DataFrame] | None = None,
    persist: bool = True,
    fused: bool = True,
) -> ValidationResult:
    """Full-suite batch validation of ``df`` (the input_hint schema).

    If ``baseline`` is None it is fitted from the first
    ``cfg.baseline_partitions`` partitions of ``df`` itself (those
    partitions receive verdict ``probation`` unless they contain
    violations — the hard-fail override).
    """
    cfg = cfg or EngineConfig()
    # ONE pass over the token bytes: a fused Arrow kernel emits both the
    # narrow per-row feature frame (size + range check) and the
    # clean-row token histogram; everything downstream runs on the
    # ~1%-size result. Caching the wide frame (tokens are ~99% of the
    # bytes) was the measured bottleneck — at 10^12 rows it is
    # impossible.
    drift_enabled = "drift" in cfg.checks
    tok_all = None
    if drift_enabled and fused:
        # one token decode total; narrow rows ride the Arrow IPC
        narrow, tok_all = featurize_and_token_histogram(df, cfg)
    else:
        # two token decodes (JVM featurize + Arrow histogram kernel);
        # no per-row IPC — wins when rows are many and tokens short
        narrow = featurize(df, cfg)
        if persist:
            narrow = narrow.persist()
        if drift_enabled:
            tok_all = token_histogram_checked(df, cfg).persist()
    base_parts: list[int]
    fit_from_self = baseline is None
    if fit_from_self:
        base_parts = baseline_part_ids(narrow, cfg)
    else:
        base_parts = baseline.get("part_ids", [])

    # violations are ~2% of rows — persist so the verdict count and the
    # returned violation rows share one computation
    viols = all_violations(narrow, cfg, featurized=True).persist()
    n_viol = viols.groupBy("part_id").agg(F.count(F.lit(1)).alias("n_violations"))
    stats = partition_stats(narrow, cfg, featurized=True)

    if drift_enabled:
        clean = row_check_flags(narrow, cfg, featurized=True).filter(
            ~F.col("any_violation")
        )
        ntok_all = ntok_histogram(clean, cfg)
        if fit_from_self:
            # the baseline is a tiny post-aggregation of the same
            # per-partition histograms the fused kernel already produced
            baseline = {
                "tok": tok_all.filter(F.col("part_id").isin(base_parts))
                .groupBy("bucket")
                .agg(F.sum("cnt").alias("cnt")),
                "ntok": ntok_all.filter(F.col("part_id").isin(base_parts))
                .groupBy("bucket")
                .agg(F.sum("cnt").alias("cnt")),
                "part_ids": base_parts,
            }
        tok_nonbase = (
            tok_all.filter(~F.col("part_id").isin(base_parts)) if base_parts else tok_all
        )
        ntok_nonbase = (
            ntok_all.filter(~F.col("part_id").isin(base_parts)) if base_parts else ntok_all
        )
        tok_scores = drift_scores(
            tok_nonbase, baseline["tok"], cfg.tok_hist_buckets
        ).withColumnsRenamed({"psi": "psi_tok", "kl": "kl_tok"})
        ntok_scores = drift_scores(
            ntok_nonbase, baseline["ntok"], cfg.ntok_hist_buckets
        ).withColumnsRenamed({"psi": "psi_ntok", "kl": "kl_ntok"})
        drift = tok_scores.join(ntok_scores, "part_id", "outer").select(
            "part_id",
            F.greatest(F.coalesce("psi_tok", F.lit(0.0)), F.coalesce("psi_ntok", F.lit(0.0))).alias("psi"),
            F.greatest(F.coalesce("kl_tok", F.lit(0.0)), F.coalesce("kl_ntok", F.lit(0.0))).alias("kl"),
        )
    else:
        drift = None

    verdicts = stats.select("part_id").join(n_viol, "part_id", "left")
    if drift is not None:
        verdicts = verdicts.join(drift, "part_id", "left")
    else:
        verdicts = verdicts.withColumn("psi", F.lit(None).cast("double")).withColumn(
            "kl", F.lit(None).cast("double")
        )
    is_base = F.col("part_id").isin(base_parts) if base_parts else F.lit(False)
    nv = F.coalesce(F.col("n_violations"), F.lit(0)).alias("n_violations")
    psi = F.when(is_base, F.lit(0.0)).otherwise(F.coalesce(F.col("psi"), F.lit(0.0)))
    kl = F.when(is_base, F.lit(0.0)).otherwise(F.coalesce(F.col("kl"), F.lit(0.0)))
    drift_enabled = "drift" in cfg.checks
    verdict = (
        F.when(nv > 0, F.lit("fail"))
        .when(is_base, F.lit("probation"))
        .when(
            F.lit(drift_enabled)
            & ((psi > cfg.psi_threshold) | (kl > cfg.kl_threshold)),
            F.lit("fail"),
        )
        .otherwise(F.lit("pass"))
    )
    verdicts = verdicts.select(
        "part_id",
        verdict.alias("verdict"),
        nv.cast("long").alias("n_violations"),
        psi.alias("psi"),
        kl.alias("kl"),
    )
    return ValidationResult(verdicts=verdicts, violations=viols, stats=stats)
