"""Two-pass exact heavy hitters: Misra-Gries sketch -> bounded
candidate set -> exact recount of candidates only.

The naive top-k over a high-cardinality key (``groupBy(value).count()
.orderBy(...).limit(k)``) shuffles one row per DISTINCT value — at
100 TB a word/URL/user key can have 10^9+ distinct values, and the
shuffle (plus the final single-partition top-k) is the bottleneck.

The classic fix is the 2-pass sketch (Misra & Gries 1982, "Finding
repeated elements"; the merge bound is Agarwal et al. 2013,
"Mergeable summaries"):

- **pass 1 (sketch)**: each input partition maintains at most
  ``sketch_k`` counters via ``mapInArrow`` — Arrow ``value_counts``
  per batch (vectorized, no per-row Python), then a dict merge that is
  O(distinct-per-batch), then the MG decrement whenever the table
  exceeds ``sketch_k``. Each partition emits its surviving (value,
  lower-bound) pairs: at most ``sketch_k`` rows per partition —
  metadata-sized regardless of input rows.
- **guarantee**: a value with true partition count > n_p/sketch_k
  survives partition p's sketch, so any value with GLOBAL count >
  N/sketch_k survives in at least one partition (pigeonhole over the
  partition it is heaviest in). The union of per-partition survivors
  is a SUPERSET of every global value with count > N/sketch_k.
- **pass 2 (exact recount)**: broadcast the candidate values (bounded
  by sketch_k x n_partitions) as a semi-join filter, count ONLY the
  candidates exactly, take the top k with a deterministic (count desc,
  value asc) tie-break. The recount shuffle carries candidate rows
  only.

The result equals the exact top-k whenever the k-th true count exceeds
N/sketch_k — ``heavy_hitters`` returns the threshold alongside so a
caller (and the tests) can verify the guarantee instead of trusting
it. Two scans of the source is the honest trade: persisting the
exploded values frame would be larger than the input at 100 TB.

Reference analog: the reference's per-feature frequency tracking
(/root/reference/htm_streamer/validation.py builds full value counts
in a single-node dict — the same dict, bounded and distributed, is
exactly Misra-Gries).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["misra_gries_candidates", "heavy_hitters"]

_CAND_SCHEMA = "value string, lb bigint"


def _mg_merge(counters: dict, values, counts, sketch_k: int) -> None:
    """Merge one batch's (value, count) pairs into the MG counter table
    in-place, then shrink back to ``sketch_k`` entries by repeatedly
    subtracting the minimum count (the batched MG decrement — each
    round removes at least one key, and undercounts every key by the
    same amount, preserving the per-partition error bound)."""
    for v, c in zip(values, counts):
        counters[v] = counters.get(v, 0) + c
    while len(counters) > sketch_k:
        m = min(counters.values())
        for v in [v for v, c in counters.items() if c <= m]:
            del counters[v]
        for v in counters:
            counters[v] -= m


def misra_gries_candidates(
    df: DataFrame, col: str, sketch_k: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries survivors: at most ``sketch_k``
    (value, lower-bound) rows per input partition. Vectorized: Arrow
    ``value_counts`` per batch, dict work proportional to DISTINCT
    values per batch, never to rows."""

    def sketch(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counters: dict = {}
        for batch in it:
            if batch.num_rows == 0:
                continue
            vc = pa.compute.value_counts(batch.column(0))
            _mg_merge(
                counters,
                vc.field("values").to_pylist(),
                vc.field("counts").to_pylist(),
                sketch_k,
            )
        items = [(v, c) for v, c in counters.items() if v is not None and c > 0]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([v for v, _ in items], pa.string()),
                pa.array([c for _, c in items], pa.int64()),
            ],
            names=["value", "lb"],
        )

    return df.select(F.col(col).cast("string").alias("value")).mapInArrow(
        sketch, _CAND_SCHEMA
    )


def heavy_hitters(
    df: DataFrame, col: str, k: int, sketch_k: int = 4096
) -> Tuple[DataFrame, DataFrame]:
    """(top_k, threshold): ``top_k`` is (value, cnt) with EXACT counts,
    ordered (cnt desc, value asc), limit k; ``threshold`` is a 1-row
    frame (n_total, guarantee_bound) where guarantee_bound =
    ceil(N/sketch_k) — the top-k is provably exact iff its k-th count
    exceeds the bound."""
    cands = misra_gries_candidates(df, col, sketch_k).select("value").distinct()
    vals = df.select(F.col(col).cast("string").alias("value"))
    top = (
        vals.join(F.broadcast(cands), "value")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
    )
    threshold = vals.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.ceil(F.count(F.lit(1)) / F.lit(sketch_k)).alias("guarantee_bound"),
    )
    return top, threshold
