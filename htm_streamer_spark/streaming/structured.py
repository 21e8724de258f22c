"""Structured Streaming binding for the validation engine.

The reference's "stream mode" is an external loop re-invoking a kernel
per row with state on disk (/root/reference/htm_streamer/pipeline/
htm_stream_runner.py:77-92). The engine's primary incremental path is
batch-with-checkpoint (streaming/incremental.py — Trigger.AvailableNow
semantics without the streaming runtime, SURVEY.md §2.9 ST1). This
module adds the true Structured Streaming binding for deployments that
want a running query: ``readStream`` over the sequences directory,
``foreachBatch`` → the same ``run_validation_batch`` plan, checkpointed
by Spark's own streaming checkpoint + the engine's manifest catalog.

Row-shaped analogs of the reference's stream-mode behaviors:
- missing/late features → violation rows, never buffered (ST4);
- per-micro-batch verdicts committed atomically (ST3);
- learning cutoff = baseline frozen after first commit (ST6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from htm_streamer_spark.config import SEQUENCES_SCHEMA, EngineConfig
from htm_streamer_spark.plans.validation_plan import run_validation_batch
from htm_streamer_spark.streaming.incremental import (
    BASELINE_NTOK,
    BASELINE_TOK,
    VERDICTS_TABLE,
    VIOLATIONS_TABLE,
    CheckpointStore,
)


def read_sequences_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming scan of the hive-partitioned sequences directory with
    the declared (never inferred) schema."""
    schema = SEQUENCES_SCHEMA
    return (
        spark.readStream.schema(
            # part_id comes from the directory layout
            ",".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in schema.fields
                if f.name != "part_id"
            )
            + ", part_id int"
        )
        .option("maxFilesPerTrigger", 64)
        .parquet(path)
    )


def validate_stream(
    spark: SparkSession,
    path: str,
    catalog,
    cfg: EngineConfig | None = None,
    checkpoint_location: str | None = None,
    available_now: bool = True,
):
    """Start a streaming validation query; returns the StreamingQuery.

    Each micro-batch runs the full batch plan and commits verdicts +
    violations through the manifest catalog in one atomic snapshot —
    exactly-once at the engine level via foreachBatch (the standard
    idempotent-sink pattern).
    """
    cfg = cfg or EngineConfig()
    store = CheckpointStore(catalog)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        import json as _json

        from pyspark.sql import functions as F

        # idempotent replay guard: if the catalog commit succeeded but the
        # Spark streaming checkpoint write did not, the micro-batch is
        # replayed with the SAME epoch_id — a second commit would duplicate
        # verdict/violation rows. Epoch ids are monotone per checkpoint, so
        # no-op when this epoch is already recorded as committed.
        last = int(catalog.prop("last_committed_epoch", "-1"))
        if epoch_id <= last:
            return

        baseline = store.baseline(spark, cfg)
        run_id = f"stream-epoch-{epoch_id}"
        props = {"last_committed_epoch": str(int(epoch_id))}
        if baseline is None:
            # SAMPLING MODE ACROSS MICRO-BATCHES (ST2: sampling →
            # initializing → running). A micro-batch may carry fewer
            # partitions than cfg.baseline_partitions — freezing a
            # baseline from it would undersize the fit (the streaming
            # analog of run_incremental's max_partitions clamp). Instead
            # stage each pre-baseline batch's per-partition histograms
            # into pending tables; commit the baseline only once K
            # distinct partitions have accumulated, summing the FIRST K
            # — identical to what a single batch run would have fitted.
            # Until then every seen partition is probation (the
            # reference's sampling-phase flat 0.5). Assumes one hive
            # partition is not split across micro-batches (one file per
            # partition dir, or compacted input).
            from htm_streamer_spark.operators.drift import (
                ntok_histogram,
                token_histogram_checked,
            )
            from htm_streamer_spark.operators.invariants import featurize, row_check_flags

            pend = _json.loads(catalog.prop("pending_baseline_parts", "[]"))
            batch_parts = sorted(
                r[0] for r in batch_df.select("part_id").distinct().collect()
            )
            tok_b = token_histogram_checked(batch_df, cfg)
            clean_b = row_check_flags(featurize(batch_df, cfg), cfg, featurized=True).filter(
                ~F.col("any_violation")
            )
            ntok_b = ntok_histogram(clean_b, cfg)
            all_parts = sorted(set(pend) | set(batch_parts))
            if len(all_parts) >= cfg.baseline_partitions:
                base_parts = all_parts[: cfg.baseline_partitions]
                prev_tok = store.catalog.read(spark, "pending_baseline_tok")
                prev_ntok = store.catalog.read(spark, "pending_baseline_ntok")
                tok_all = tok_b if prev_tok is None else prev_tok.unionByName(tok_b)
                ntok_all = ntok_b if prev_ntok is None else prev_ntok.unionByName(ntok_b)
                baseline = {
                    "tok": tok_all.filter(F.col("part_id").isin(base_parts))
                    .groupBy("bucket")
                    .agg(F.sum("cnt").alias("cnt")),
                    "ntok": ntok_all.filter(F.col("part_id").isin(base_parts))
                    .groupBy("bucket")
                    .agg(F.sum("cnt").alias("cnt")),
                    "part_ids": base_parts,
                }
                catalog.stage_spark(BASELINE_TOK, baseline["tok"])
                catalog.stage_spark(BASELINE_NTOK, baseline["ntok"])
                props["baseline_part_ids"] = _json.dumps(base_parts)
            else:
                # still sampling: stage this batch's histograms, score the
                # batch with every partition in probation (no drift yet)
                catalog.stage_spark("pending_baseline_tok", tok_b)
                catalog.stage_spark("pending_baseline_ntok", ntok_b)
                props["pending_baseline_parts"] = _json.dumps(all_parts)
                empty_hist = spark.createDataFrame([], "bucket int, cnt long")
                baseline = {"tok": empty_hist, "ntok": empty_hist, "part_ids": batch_parts}
        result = run_validation_batch(spark, batch_df, cfg, baseline=baseline)
        catalog.stage_spark(
            VIOLATIONS_TABLE, result.violations.withColumn("run_id", F.lit(run_id))
        )
        catalog.stage_spark(
            VERDICTS_TABLE,
            result.verdicts.select(
                F.lit(run_id).alias("run_id"),
                "part_id",
                F.col("verdict").alias("status"),
                F.to_json(F.struct("n_violations", "psi", "kl")).alias("metrics"),
                F.lit(float(epoch_id)).alias("committed_at"),
            ),
        )
        catalog.commit(props)

    stream = read_sequences_stream(spark, path)
    writer = stream.writeStream.foreachBatch(process_batch).outputMode("update")
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
