"""Schema drift detection: compare a landed frame's schema against the
declared contract and report added / missing / retyped / renullabled
columns — the check that runs BEFORE any data check, because a silent
upstream schema change is the most common way a 100 TB pipeline rots.

Driver-side metadata only (schemas, not data): zero jobs, zero scans.
The report is returned as a DataFrame so it lands in the same sinks as
every other violation stream (check_id = ``schema_drift``).

Reference analog: the reference validates its CONFIG schema
(/root/reference/htm_streamer/config/validation.py) but trusts the
data frame's dtypes as read; this closes that gap Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

REPORT_SCHEMA = (
    "column string, status string, declared string, observed string"
)


def _flat(schema: T.StructType) -> dict[str, tuple[str, bool]]:
    return {f.name: (f.dataType.simpleString(), f.nullable) for f in schema.fields}


def schema_drift_report(
    spark: SparkSession,
    observed: T.StructType | DataFrame,
    declared: T.StructType,
) -> DataFrame:
    """(column, status, declared, observed) — one row per drifted
    column; empty = contract holds. Statuses:

    - ``missing``   declared column absent from the landing
    - ``added``     landed column the contract doesn't know (benign for
                    consumers that project, but must be REPORTED — it's
                    how typos ship: `sourec` added + `source` missing)
    - ``retyped``   same name, different type (the dangerous one:
                    int32→int64 widens silently, string→int truncates)
    - ``renullabled`` declared non-null, observed nullable — a weaker
                    contract than promised
    """
    obs = _flat(observed.schema if isinstance(observed, DataFrame) else observed)
    dec = _flat(declared)
    rows: list[tuple[str, str, str | None, str | None]] = []
    for name, (dtype, dnull) in dec.items():
        if name not in obs:
            rows.append((name, "missing", dtype, None))
            continue
        otype, onull = obs[name]
        if otype != dtype:
            rows.append((name, "retyped", dtype, otype))
        elif onull and not dnull:
            rows.append((name, "renullabled", f"{dtype} NOT NULL", f"{otype} NULL"))
    for name, (otype, _) in obs.items():
        if name not in dec:
            rows.append((name, "added", None, otype))
    return spark.createDataFrame(rows, REPORT_SCHEMA)


def assert_schema(spark: SparkSession, observed, declared: T.StructType) -> None:
    """Fail-fast twin: raise TypeError naming every drifted column
    (missing/retyped kill the run; added/renullabled are listed too so
    the error is the complete diff, not the first surprise)."""
    report = schema_drift_report(spark, observed, declared).collect()
    if report:
        detail = "; ".join(
            f"{r.column}: {r.status} (declared={r.declared}, observed={r.observed})"
            for r in report
        )
        raise TypeError(f"schema drift vs declared contract: {detail}")
