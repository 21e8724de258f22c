"""Multi-format record source: land CSV / JSONL / parquet into the
declared sequences schema with malformed-row capture — never schema
inference.

Reference analog: the reference ingests CSV time-series
(/root/reference/driver.py:60-75 reads NAB CSVs; htm_batch_runner.py
consumes the frame) and silently trusts every row. Here the ingest is
schema-DECLARED (inference would be a second pass over 100 TB and a
schema drift hazard) and malformed rows are captured as first-class
violation rows (check_id ``malformed_record``) instead of crashing the
job or vanishing — the same violations contract the row checks use.

Format notes:
- CSV cannot carry arrays, so ``tokens`` travels as a JSON string
  column and is parsed with ``from_json`` (malformed token payloads
  parse to null and surface as ``malformed_tokens``). This is the
  standard interchange shape for array columns in CSV landings.
- JSONL carries arrays natively; a syntactically-broken line lands in
  the corrupt-record column.
- PERMISSIVE + columnNameOfCorruptRecord is used (FAILFAST would kill
  a 100 TB job on one bad line; DROPMALFORMED silently loses rows —
  both wrong for a validation engine whose whole job is accounting).
- Spark disallows filtering on ONLY the corrupt column straight off a
  raw scan (SPARK-21610), so the parsed frame is persisted before the
  good/corrupt split — the cache holds exactly one micro-pass of the
  input and both branches reuse it.

Scale notes: CSV/JSONL scans are line-splittable (keep files
uncompressed or use a splittable codec at scale); the declared schema
prunes columns at parse time; the persisted split frame is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

SEQ_CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("tokens", T.StringType()),  # JSON-encoded array
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    return T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def read_records(
    spark: SparkSession,
    path: str,
    fmt: str = "jsonl",
    schema: T.StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Read ``path`` as the sequences table in the given format.

    Returns ``(good, corrupt)``: ``good`` has the canonical columns
    (doc_id, tokens array<int>, n_tok, source, ts, part_id); ``corrupt``
    has (raw, check_id) — one row per malformed input line, check_id =
    ``malformed_record`` (unparseable line) or ``malformed_tokens``
    (line parsed but the tokens payload didn't).
    """
    if fmt == "parquet":
        df = spark.read.parquet(path)
        empty = spark.createDataFrame([], "raw string, check_id string")
        return df, empty

    base = schema or (SEQ_CSV_SCHEMA if fmt == "csv" else jsonl_schema())
    reader = (
        spark.read.schema(_with_corrupt(base))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    if fmt == "csv":
        parsed = reader.option("header", "true").csv(path)
    elif fmt == "jsonl":
        parsed = reader.json(path)
    else:
        raise ValueError(f"unknown record format {fmt!r}")

    # SPARK-21610: can't filter on only the corrupt column of a raw
    # scan; persist the parsed frame so both branches split one pass
    parsed = parsed.persist()

    corrupt = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw"), F.lit("malformed_record").alias("check_id")
    )
    ok = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)

    if dict(ok.dtypes).get("tokens") == "string":
        # tokens arrived as a JSON string (the CSV interchange shape):
        # parse; payloads that don't parse surface as malformed_tokens
        tok = F.from_json(F.col("tokens"), "array<int>")
        bad_tok = ok.filter(F.col("tokens").isNotNull() & tok.isNull()).select(
            F.col("tokens").alias("raw"), F.lit("malformed_tokens").alias("check_id")
        )
        corrupt = corrupt.unionByName(bad_tok)
        ok = ok.withColumn("tokens", tok)
    return ok, corrupt


def jsonl_schema() -> T.StructType:
    """Declared JSONL schema: tokens is a real array here."""
    return T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("part_id", T.IntegerType()),
        ]
    )
