"""Z-order (Morton) clustering for multi-column scan locality.

A table sorted by one column prunes scans on that column only; a box
predicate on (x, y) still reads every file for the y-range. Interleaving
the bits of both columns' bucket ids (the Morton curve) makes files
cover small RECTANGLES of the (x, y) space instead of thin stripes, so
min/max footer stats prune on BOTH dimensions — the layout technique
behind Delta/Iceberg's OPTIMIZE ZORDER, reimplemented here as pure
codegen expressions (shiftleft/and/or chains; no UDF, no hash).

At 100 TB this is a write-once cost (one range-partitioned sort) that
every subsequent multi-dimensional scan amortizes; the z-key is never
stored — it exists only as the write-time clustering key.

``prune_stats`` reads the parquet footers directly (pyarrow) and
reports how many row groups a box predicate can skip — engine-level
evidence, not a micro-benchmark.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "write_zordered", "prune_stats"]


def _bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Equal-width bucket id in [0, 2^bits) as a long. width_bucket
    returns 1..n inside the range and 0 / n+1 for outliers — clamp."""
    n = 1 << bits
    b = F.width_bucket(col.cast("double"), F.lit(lo), F.lit(hi), F.lit(n))
    return F.greatest(
        F.lit(0), F.least(F.lit(n - 1), (b - 1).cast("long"))
    )


def zorder_key(
    cols: list[Column], ranges: list[tuple[float, float]], bits: int = 10
) -> Column:
    """Morton-interleave the equal-width bucket ids of ``cols`` (each
    mapped over its [lo, hi) range) into one long. ``len(cols) * bits``
    must stay ≤ 62. Pure codegen: a shiftleft/bitwiseOR chain."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError(f"{k} cols x {bits} bits exceeds a long")
    bucketed = [
        _bucketize(c, lo, hi, bits) for c, (lo, hi) in zip(cols, ranges)
    ]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucketed):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * k + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str | Path,
    cols: list[str],
    n_files: int = 16,
    bits: int = 10,
) -> None:
    """Cluster ``df`` on the Morton key of ``cols`` and write parquet:
    one range-partitioned sort (the z-key ranges are contiguous per
    file, so each file covers a compact rectangle), key dropped before
    write. Column ranges come from one metadata-scale min/max probe."""
    probe = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    ranges = [
        (float(probe[f"lo_{c}"]), float(probe[f"hi_{c}"]) + 1e-9)
        for c in cols
    ]
    z = zorder_key([F.col(c) for c in cols], ranges, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(str(path))
    )


def prune_stats(
    path: str | Path, box: dict[str, tuple[float, float]]
) -> dict:
    """Footer-level pruning evidence: for every parquet row group under
    ``path``, intersect its min/max stats with the box predicate
    {col: (lo, hi)}; a row group whose stats MISS the box on any column
    is skippable without being read. Returns total/skippable counts and
    the prune fraction — exactly the decision a parquet reader makes."""
    import pyarrow.parquet as pq

    files = sorted(Path(path).glob("*.parquet"))
    total = 0
    skippable = 0
    for f in files:
        pf = pq.ParquetFile(f)
        names = [pf.schema_arrow.names.index(c) for c in box]
        for rg in range(pf.num_row_groups):
            total += 1
            meta = pf.metadata.row_group(rg)
            for idx, (col, (lo, hi)) in zip(names, box.items()):
                st = meta.column(idx).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.max < lo or st.min > hi:
                    skippable += 1
                    break
    return {
        "row_groups": total,
        "skippable": skippable,
        "prune_fraction": skippable / total if total else 0.0,
    }
