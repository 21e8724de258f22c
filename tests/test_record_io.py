"""Multi-format landing: CSV/JSONL with declared schema, malformed-row
capture, and verdict parity with the parquet path on the same data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.sources.record_io import read_records

CSV_HEADER = "doc_id,tokens,n_tok,source,ts,part_id"
GOOD_CSV = [
    'd1,"[1,2,3]",3,web,2024-01-01T00:00:00,0',
    'd2,"[4,5]",2,web,2024-01-01T00:01:00,0',
    'd3,"[6]",1,books,2024-01-01T00:02:00,1',
]
BAD_TOKENS_CSV = 'd4,"not-json",1,web,2024-01-01T00:03:00,1'
# n_tok is declared int; a non-numeric value makes the LINE malformed
BAD_LINE_CSV = 'd5,"[7]",NOT_A_NUMBER,web,2024-01-01T00:04:00,1'

GOOD_JSONL = [
    '{"doc_id":"d1","tokens":[1,2,3],"n_tok":3,"source":"web","ts":"2024-01-01T00:00:00","part_id":0}',
    '{"doc_id":"d2","tokens":[4,5],"n_tok":2,"source":"web","ts":"2024-01-01T00:01:00","part_id":0}',
]
BAD_JSONL = '{"doc_id":"d3","tokens":[6,,],"n_tok":1'  # broken syntax


def test_csv_good_and_malformed_split(spark, tmp_path):
    p = tmp_path / "seq.csv"
    p.write_text("\n".join([CSV_HEADER, *GOOD_CSV, BAD_TOKENS_CSV, BAD_LINE_CSV]) + "\n")
    good, corrupt = read_records(spark, str(p), fmt="csv")
    g = {r.doc_id: r for r in good.collect()}
    # the malformed-line row parses to nulls in good (its doc may be
    # unrecoverable) but is ACCOUNTED in corrupt; the bad-tokens row
    # stays in good with null tokens AND is accounted
    assert set(g) >= {"d1", "d2", "d3", "d4"}
    assert list(g["d1"].tokens) == [1, 2, 3]
    assert g["d4"].tokens is None
    c = [(r.check_id, r.raw) for r in corrupt.collect()]
    assert ("malformed_tokens", "not-json") in c
    assert any(cid == "malformed_record" and "NOT_A_NUMBER" in raw for cid, raw in c)


def test_jsonl_native_arrays_and_corrupt_line(spark, tmp_path):
    p = tmp_path / "seq.jsonl"
    p.write_text("\n".join([*GOOD_JSONL, BAD_JSONL]) + "\n")
    good, corrupt = read_records(spark, str(p), fmt="jsonl")
    g = {r.doc_id: list(r.tokens) for r in good.collect() if r.doc_id}
    assert g == {"d1": [1, 2, 3], "d2": [4, 5]}
    c = corrupt.collect()
    assert len(c) == 1 and c[0].check_id == "malformed_record"
    assert c[0].raw.startswith('{"doc_id":"d3"')


def test_validation_verdicts_equal_across_formats(spark, tmp_path):
    """The same rows landed via JSONL produce the same verdicts as the
    parquet path — format is a landing detail, not a semantic."""
    from htm_streamer_spark.config import EngineConfig
    from htm_streamer_spark.plans.validation_plan import (
        load_sequences,
        run_validation_batch,
    )

    pq_dir = tmp_path / "pq"
    from htm_streamer_spark.fixtures.generator import write_sequences_parquet

    write_sequences_parquet(pq_dir, n_partitions=4, rows_per_partition=200)
    df_pq = load_sequences(spark, str(pq_dir))

    jl = tmp_path / "seq_jl"
    df_pq.select(
        "doc_id", "tokens", "n_tok", "source",
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
        "part_id",
    ).coalesce(1).write.json(str(jl))
    good, corrupt = read_records(spark, str(jl), fmt="jsonl")
    assert corrupt.count() == 0
    cfg = EngineConfig(baseline_partitions=1)
    v_pq = run_validation_batch(spark, df_pq, cfg).verdicts
    v_jl = run_validation_batch(
        spark, good.select(*df_pq.columns), cfg
    ).verdicts
    a = sorted(map(tuple, v_pq.collect()))
    b = sorted(map(tuple, v_jl.collect()))
    assert a == b
