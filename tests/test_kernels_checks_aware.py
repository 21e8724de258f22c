"""Fused Arrow kernels must honor cfg.checks and null-token semantics.

Regression tests for two divergences: (1) the fused clean mask used to
hard-code all five row checks while the native path honored cfg.checks,
so disabling a check changed the clean-row histograms only on one path;
(2) null token arrays flattened to length 0 in Arrow (firing
len_mismatch/empty) while native F.size(NULL) is NULL.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from htm_streamer_spark.config import SEQUENCES_SCHEMA, EngineConfig
from htm_streamer_spark.operators.drift import (
    featurize_and_token_histogram,
    token_histogram_checked,
)
from htm_streamer_spark.operators.invariants import featurize, row_check_flags
from htm_streamer_spark.functions.array_funcs import token_bucket_expr


@pytest.fixture(scope="module")
def messy(spark):
    """Small frame exercising every dirty-row species, incl. null tokens."""
    rows = [
        ("d0", [1, 2, 3], 3, "web", None, 0),          # clean
        ("d1", [5, 6], 3, "web", None, 0),             # len_mismatch
        ("d2", [99999999], 1, "web", None, 0),         # token_range
        ("d3", [], 0, "web", None, 1),                 # empty_tokens
        ("d4", [7], 1, "nope", None, 1),               # bad_source
        ("d5", [8, 9], None, "web", None, 1),          # null_n_tok
        ("d6", None, 2, "web", None, 1),               # null tokens
        ("d7", [10, 11, 12, 13], 4, "books", None, 1), # clean
    ]
    return spark.createDataFrame(rows, schema=SEQUENCES_SCHEMA)


def _native_clean_hist(df, cfg):
    """The non-fused reference: native flags -> filter -> explode/count."""
    clean = row_check_flags(df, cfg).filter(~F.col("any_violation"))
    return (
        clean.select(
            "part_id",
            F.explode(
                F.transform(
                    "tokens",
                    lambda t: token_bucket_expr(t, cfg.tok_hist_buckets, cfg.vocab_size),
                )
            ).alias("bucket"),
        )
        .groupBy("part_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _collect(df) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


CHECK_SETS = [
    ("null_n_tok", "len_mismatch", "token_range", "empty_tokens", "bad_source"),
    ("len_mismatch",),
    ("token_range", "bad_source"),
    ("empty_tokens",),
    ("null_n_tok", "bad_source"),
]


@pytest.mark.parametrize("checks", CHECK_SETS, ids=["all", "len", "range+src", "empty", "null+src"])
def test_checked_hist_matches_native_per_checkset(spark, messy, checks):
    cfg = EngineConfig(checks=checks)
    fused = token_histogram_checked(messy, cfg)
    native = _native_clean_hist(messy, cfg)
    assert _collect(fused) == _collect(native)


@pytest.mark.parametrize("checks", CHECK_SETS, ids=["all", "len", "range+src", "empty", "null+src"])
def test_fused_featurize_hist_matches_native_per_checkset(spark, messy, checks):
    cfg = EngineConfig(checks=checks)
    narrow, hist = featurize_and_token_histogram(messy, cfg)
    native = _native_clean_hist(messy, cfg)
    assert _collect(hist) == _collect(native)
    narrow.unpersist()


def test_fused_narrow_frame_matches_native_featurize(spark, messy):
    """tok_len must be NULL (not 0) for null token arrays; tok_oob False."""
    cfg = EngineConfig()
    narrow, _ = featurize_and_token_histogram(messy, cfg)
    fused = {r["doc_id"]: (r["tok_len"], r["tok_oob"]) for r in narrow.collect()}
    native = {r["doc_id"]: (r["tok_len"], r["tok_oob"]) for r in featurize(messy, cfg).collect()}
    assert fused == native
    assert fused["d6"] == (None, False)
    narrow.unpersist()
