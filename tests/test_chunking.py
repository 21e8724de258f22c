"""Chunking operator: overlapping token windows (operators/chunking.py).

Pins the chunk-count formula, tail semantics, overlap coverage (every
token lands in >= 1 chunk; consecutive chunks share exactly
chunk_size - stride tokens except at the tail), and the zero-shuffle /
no-Python plan shape.
"""

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.chunking import chunk_tokens


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_short_doc_single_chunk(spark):
    df = _docs(spark, [("a", "x y z")])
    out = chunk_tokens(df, chunk_size=64, stride=48).collect()
    assert len(out) == 1
    assert out[0].chunk_id == 0 and out[0].n_tokens == 3


def test_empty_and_whitespace_docs_produce_no_chunks(spark):
    df = _docs(spark, [("a", ""), ("b", "   "), ("c", "one")])
    out = chunk_tokens(df).collect()
    assert [r.doc_id for r in out] == ["c"]


def test_exact_tiling_no_overlap(spark):
    text = " ".join(f"t{i}" for i in range(12))
    df = _docs(spark, [("a", text)])
    out = sorted(chunk_tokens(df, chunk_size=4, stride=4).collect(),
                 key=lambda r: r.chunk_id)
    assert [r.n_tokens for r in out] == [4, 4, 4]


def test_chunk_count_formula_and_tail(spark):
    # n=100, size=64, stride=48 -> chunks at [1..64], [49..100]
    text = " ".join(f"t{i}" for i in range(100))
    df = _docs(spark, [("a", text)])
    out = sorted(chunk_tokens(df, chunk_size=64, stride=48).collect(),
                 key=lambda r: r.chunk_id)
    assert [r.chunk_id for r in out] == [0, 1]
    assert [r.n_tokens for r in out] == [64, 52]


@pytest.mark.parametrize("n,size,stride", [(1, 4, 2), (4, 4, 2), (5, 4, 2),
                                           (9, 4, 3), (100, 7, 7), (23, 8, 1)])
def test_coverage_and_overlap_property(spark, n, size, stride):
    toks = [f"w{i}" for i in range(n)]
    df = _docs(spark, [("a", " ".join(toks))])
    out = sorted(chunk_tokens(df, chunk_size=size, stride=stride).collect(),
                 key=lambda r: r.chunk_id)
    # python reference: starts every `stride` until the window reaches the end
    import math
    expect = 1 if n <= size else math.ceil((n - size) / stride) + 1
    assert len(out) == expect
    covered = set()
    for r in out:
        start = r.chunk_id * stride
        covered |= set(range(start, min(start + size, n)))
        assert r.n_tokens == min(size, n - start)
    assert covered == set(range(n))


def test_chunk_hash_matches_slice(spark):
    import hashlib
    toks = [f"w{i}" for i in range(10)]
    df = _docs(spark, [("a", " ".join(toks))])
    out = sorted(chunk_tokens(df, chunk_size=6, stride=4).collect(),
                 key=lambda r: r.chunk_id)
    for r in out:
        start = r.chunk_id * 4
        want = hashlib.md5(" ".join(toks[start:start + 6]).encode()).hexdigest()
        assert r.chunk_hash == want


def test_invalid_params_raise(spark):
    df = _docs(spark, [("a", "x")])
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=4, stride=5)
    with pytest.raises(ValueError):
        chunk_tokens(df, chunk_size=0)


def test_plan_zero_shuffle_no_python(spark):
    df = _docs(spark, [("a", "x y z")])
    plan = chunk_tokens(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
