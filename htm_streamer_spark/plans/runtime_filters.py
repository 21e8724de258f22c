"""Runtime Bloom-filter join reduction: make the selective side of a
shuffle join prune the big side's SCAN before the shuffle.

At 100 TB the classic killer join is fact ⋈ (selectively filtered
dim): the dim filter keeps 1% of keys, but the fact side still
shuffles ALL its rows because the surviving key set isn't known at
plan time. Catalyst's runtime filter optimization (Spark 3.3+,
`spark.sql.optimizer.runtime.bloomFilter.enabled`, on by default)
fixes this adaptively: it aggregates a Bloom filter over the dim
side's join keys (`bloom_filter_agg`) and injects
`might_contain(xxhash64(key))` into the fact side's scan filter — the
fact rows that can't match die AT THE SCAN, before shuffle bytes are
paid. False positives only cost shuffle rows; the join itself stays
exact.

Why a helper exists: the optimization gates on size thresholds
(`creationSideThreshold` 10 MB, `applicationSideScanSizeThreshold`
10 GB by default) tuned for clusters — at test scale it silently
never fires, so nothing in a small-scale run proves the plan shape.
:func:`runtime_bloom` scopes the thresholds so tests (and small-scale
reproductions) can pin the exact plan a 100-TB run would get;
production leaves the defaults alone.

Evidence: tests/test_runtime_filter.py asserts the bloom_filter_agg /
might_contain pair appears in the fact scan's plan under the scoped
thresholds, disappears outside them, and that the join answer is
IDENTICAL either way.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

__all__ = ["runtime_bloom"]

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # creation side: largest filtered-dim size we'll build a bloom for
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": None,
    # application side: smallest fact-scan size worth pruning
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": None,
}


@contextmanager
def runtime_bloom(
    spark: SparkSession,
    creation_side: str = "10GB",
    application_side: str = "0",
):
    """Scope runtime-bloom thresholds: inside the block, joins whose
    filtered build side is under ``creation_side`` and whose probe
    scan is over ``application_side`` get the injected filter."""
    values = dict(_CONFS)
    values[
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold"
    ] = creation_side
    values[
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    ] = application_side
    old: dict[str, str | None] = {}
    for k, v in values.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
