"""Schema drift: every status, the clean case, and the fail-fast twin.
Metadata-only — the report must run zero Spark jobs over the data."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from htm_streamer_spark.operators.schema_drift import (
    assert_schema,
    schema_drift_report,
)

DECLARED = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), nullable=False),
        T.StructField("n_tok", T.IntegerType(), nullable=True),
        T.StructField("source", T.StringType(), nullable=True),
    ]
)


def test_clean_contract_empty_report(spark):
    df = spark.createDataFrame([], DECLARED)
    assert schema_drift_report(spark, df, DECLARED).count() == 0
    assert_schema(spark, df, DECLARED)  # no raise


def test_all_statuses_reported(spark):
    observed = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), nullable=True),  # renullabled
            T.StructField("n_tok", T.LongType()),                    # retyped
            T.StructField("sourec", T.StringType()),                 # added (typo)
            # source: missing
        ]
    )
    got = {
        r.column: (r.status, r.declared, r.observed)
        for r in schema_drift_report(spark, observed, DECLARED).collect()
    }
    assert got["source"] == ("missing", "string", None)
    assert got["n_tok"] == ("retyped", "int", "bigint")
    assert got["sourec"] == ("added", None, "string")
    assert got["doc_id"] == ("renullabled", "string NOT NULL", "string NULL")


def test_assert_schema_names_every_drift(spark):
    observed = T.StructType([T.StructField("n_tok", T.DoubleType())])
    with pytest.raises(TypeError) as e:
        assert_schema(spark, observed, DECLARED)
    msg = str(e.value)
    assert "n_tok: retyped" in msg and "doc_id: missing" in msg and "source: missing" in msg


def test_report_runs_no_jobs_over_data(spark):
    """The report is schema metadata only — a DataFrame argument must
    not trigger a scan (tracked via the Spark status API)."""
    df = spark.range(10).selectExpr(
        "cast(id as string) doc_id", "cast(id as int) n_tok", "'web' source"
    )
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    schema_drift_report(spark, df, DECLARED)  # build only, no collect
    after = tracker.getJobIdsForGroup(None)
    assert before == after
