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
            # first micro-batch: fit + commit the baseline (ST2/ST6 —
            # sampling → initializing; frozen afterwards)
            from htm_streamer_spark.plans.validation_plan import compute_baseline

            baseline = compute_baseline(batch_df, cfg)
            catalog.stage_spark(BASELINE_TOK, baseline["tok"])
            catalog.stage_spark(BASELINE_NTOK, baseline["ntok"])
            props["baseline_part_ids"] = _json.dumps(baseline["part_ids"])
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
