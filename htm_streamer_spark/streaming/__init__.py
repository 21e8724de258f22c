from htm_streamer_spark.streaming.incremental import (
    CheckpointStore,
    run_incremental,
)

__all__ = ["CheckpointStore", "run_incremental"]
