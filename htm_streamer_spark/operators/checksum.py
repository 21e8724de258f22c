"""Order-independent, engine-portable table content digest.

Replica validation at 100 TB — "is the copy on the other cluster /
the other engine / yesterday's snapshot the SAME table?" — can't sort
10^12 rows to compare them, and can't rely on an engine-specific hash
(Spark's xxhash64 and DuckDB's hash() disagree by construction). The
portable shape is:

1. canonicalize each row to ONE string using only representations
   every engine renders identically (ints/strings as-is, timestamps
   via an explicit format string, floats through a fixed-scale
   decimal),
2. hash that string with a hash every engine ships (md5), take 60
   bits,
3. SUM the per-row hashes per group — addition commutes, so the
   digest is independent of row order, partitioning, and file layout,
   and it's map-side combinable: one scan, one tiny shuffle, digest
   cost O(rows) with no sort anywhere.

The sum runs in exact decimal/int128 arithmetic (never float, never
wrapping int64) and is reported mod 10^18 so it fits a BIGINT in any
engine. A count per group rides along: sum-of-hashes alone can't
distinguish {} from a set of rows whose hashes cancel mod 10^18
(astronomically unlikely, but count is free).

Collision bound: 60-bit hashes summed over n rows — two different
tables collide with probability ~n/2^60 per group; for a change
detector (the use case) that's negligible, and any single-row change
flips the digest with probability 1 - 2^-60.

Reference analog: the reference's self-check assertions
(htm_streamer/validation.py) compare scalar aggregates of a run
against expectations; this extends the idea to full-content equality
across engines and layouts.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["canonical_row", "table_digest"]

_MOD = 10**18
_NULL = ""  # sentinel distinct from any real value and from ''
_SEP = ""  # unit separator between columns


def _canonical_col(df: DataFrame, name: str) -> Column:
    """One engine-portable string rendering per type. Anything not
    covered raises rather than silently producing an engine-specific
    rendering that only LOOKS portable."""
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, (T.StringType,)):
        s = c
    elif isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.BooleanType)
    ):
        s = c.cast("string")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        s = F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    elif isinstance(dt, T.DateType):
        s = F.date_format(c, "yyyy-MM-dd")
    elif isinstance(dt, (T.DoubleType, T.FloatType)):
        # fixed-scale decimal: '123.456700' renders identically in
        # Spark and DuckDB, where raw double→string does not (1.0E20
        # vs 1e+20)
        s = c.cast("decimal(28,6)").cast("string")
    elif isinstance(dt, T.DecimalType):
        s = c.cast("string")
    else:
        raise TypeError(
            f"table_digest: no portable canonical form for column "
            f"{name!r} of type {dt.simpleString()}"
        )
    return F.coalesce(s, F.lit(_NULL))


def canonical_row(df: DataFrame, cols: Sequence[str]) -> Column:
    """The canonical string a row hashes to — exposed so tests and
    oracles can pin the exact rendering."""
    return F.concat_ws(_SEP, *[_canonical_col(df, c) for c in cols])


def table_digest(
    df: DataFrame,
    cols: Sequence[str],
    group_by: Optional[str] = None,
) -> DataFrame:
    """(group?, n_rows, digest): order/layout-independent content
    digest. Same rows in any partitioning → same digest; any one-row
    difference → different digest (w.p. 1 - 2^-60)."""
    h = F.conv(F.substring(F.md5(canonical_row(df, cols)), 1, 15), 16, 10).cast(
        "decimal(38,0)"
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(h) % F.lit(_MOD)).cast("long").alias("digest"),
    ]
    if group_by is None:
        return df.agg(*aggs)
    return df.groupBy(group_by).agg(*aggs)
