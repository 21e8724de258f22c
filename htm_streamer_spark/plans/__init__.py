from htm_streamer_spark.plans.validation_plan import (
    ValidationResult,
    compute_baseline,
    load_sequences,
    run_validation_batch,
)

__all__ = [
    "ValidationResult",
    "compute_baseline",
    "load_sequences",
    "run_validation_batch",
]
