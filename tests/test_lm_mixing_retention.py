"""Unit tests for the round-4 analytics additions: corpus unigram LM
scoring, OOV rate, mixture planning, and cohort retention."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from htm_streamer_spark.operators.funnel import retention_cohorts
from htm_streamer_spark.operators.lm import oov_rate, unigram_nll
from htm_streamer_spark.operators.mixing import mixture_weights


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_unigram_nll_hand_computed(spark):
    # corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, total=5
    df = _docs(spark, [(1, "a a b", "s"), (2, "a c", "s")])
    out = {r["doc_id"]: r for r in unigram_nll(df).collect()}
    pa, pb, pc = 3 / 5, 1 / 5, 1 / 5
    exp1 = -(2 * math.log(pa) + math.log(pb)) / 3
    exp2 = -(math.log(pa) + math.log(pc)) / 2
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 2
    assert abs(out[1]["nll"] - exp1) < 1e-5
    assert abs(out[2]["nll"] - exp2) < 1e-5


def test_unigram_nll_uniform_corpus_is_flat(spark):
    # every token equally likely -> every doc's nll == ln(V)
    df = _docs(spark, [(1, "x y", "s"), (2, "z w", "s")])
    out = unigram_nll(df).collect()
    for r in out:
        assert abs(r["nll"] - math.log(4)) < 1e-5


def test_unigram_nll_skips_blank_docs(spark):
    df = _docs(spark, [(1, "a", "s"), (2, "   ", "s"), (3, "", "s")])
    assert [r["doc_id"] for r in unigram_nll(df).collect()] == [1]


def test_oov_rate_vocab_boundary_and_ties(spark):
    # counts: a=3, b=2, c=2, d=1; vocab_size=2 keeps a and b
    # (count desc, term asc tie-break puts b before c).
    df = _docs(
        spark,
        [(1, "a a b c", "s"), (2, "a b c d", "s")],
    )
    out = {r["doc_id"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_oov"] == 1  # c
    assert out[2]["n_tokens"] == 4 and out[2]["n_oov"] == 2  # c, d
    assert abs(out[1]["oov"] - 0.25) < 1e-6
    assert abs(out[2]["oov"] - 0.5) < 1e-6


def test_oov_rate_full_vocab_means_zero(spark):
    df = _docs(spark, [(1, "p q r", "s")])
    row = oov_rate(df, vocab_size=10).collect()[0]
    assert row["n_oov"] == 0 and abs(row["oov"]) < 1e-6


def test_mixture_weights_caps_and_epochs(spark):
    # two sources: big=8 tokens, small=2 tokens; budget 8 -> target 4
    # big: rate 0.5 / epochs 0.5; small: rate capped 1.0 / epochs 2.0
    df = _docs(
        spark,
        [
            (1, "t t t t", "big"),
            (2, "t t t t", "big"),
            (3, "t t", "small"),
        ],
    )
    out = {r["source"]: r for r in mixture_weights(df, budget_tokens=8).collect()}
    assert out["big"]["n_docs"] == 2 and out["big"]["n_tokens"] == 8
    assert abs(out["big"]["target_tokens"] - 4.0) < 1e-6
    assert abs(out["big"]["rate"] - 0.5) < 1e-6
    assert abs(out["big"]["epochs"] - 0.5) < 1e-6
    assert abs(out["small"]["rate"] - 1.0) < 1e-6
    assert abs(out["small"]["epochs"] - 2.0) < 1e-6


def test_apply_mixture_sample_keeps_all_under_huge_budget(spark):
    from htm_streamer_spark.operators.mixing import apply_mixture_sample

    df = _docs(spark, [(i, "a b c", "s") for i in range(20)])
    out = apply_mixture_sample(df, budget_tokens=10**9)
    assert out.count() == 20


def test_apply_mixture_sample_deterministic_across_partitioning(spark):
    from htm_streamer_spark.operators.mixing import apply_mixture_sample

    rows = [(i, "tok " * 5, f"src{i % 2}") for i in range(200)]
    df = _docs(spark, rows)
    kept1 = {r["doc_id"] for r in apply_mixture_sample(df, budget_tokens=500).collect()}
    kept2 = {
        r["doc_id"]
        for r in apply_mixture_sample(df.repartition(13), budget_tokens=500).collect()
    }
    assert kept1 == kept2
    # budget 500 over 2 sources -> 250 target vs 500 tokens/source:
    # rate 0.5, so roughly half of each source survives the hash coin
    assert 0 < len(kept1) < 200


def test_mixture_weights_non_uniform_shares(spark):
    # big: 8 tokens, small: 2; shares 75/25 of budget 8 -> targets 6/2
    df = _docs(
        spark,
        [(1, "t t t t", "big"), (2, "t t t t", "big"), (3, "t t", "small")],
    )
    out = {
        r["source"]: r
        for r in mixture_weights(
            df, budget_tokens=8, target_shares={"big": 0.75, "small": 0.25}
        ).collect()
    }
    assert abs(out["big"]["target_tokens"] - 6.0) < 1e-6
    assert abs(out["big"]["rate"] - 0.75) < 1e-6
    assert abs(out["small"]["target_tokens"] - 2.0) < 1e-6
    assert abs(out["small"]["rate"] - 1.0) < 1e-6


def test_mixture_weights_unlisted_source_excluded(spark):
    df = _docs(spark, [(1, "t t", "a"), (2, "t t", "b")])
    out = {
        r["source"]: r
        for r in mixture_weights(
            df, budget_tokens=4, target_shares={"a": 1.0}
        ).collect()
    }
    assert abs(out["b"]["rate"]) < 1e-6 and abs(out["b"]["target_tokens"]) < 1e-6


def test_mixture_weights_rejects_bad_shares(spark):
    import pytest

    df = _docs(spark, [(1, "t", "a")])
    with pytest.raises(ValueError, match="sum to 1"):
        mixture_weights(df, budget_tokens=1, target_shares={"a": 0.5})


def test_mixture_weights_counts_blank_docs_as_zero_tokens(spark):
    df = _docs(spark, [(1, "a b", "s"), (2, "   ", "s")])
    row = mixture_weights(df, budget_tokens=2).collect()[0]
    assert row["n_docs"] == 2 and row["n_tokens"] == 2


def test_retention_cohorts_triangle(spark):
    # periods of 10 seconds; epoch-second timestamps via to_timestamp.
    # user 1: periods 0,1,2 ; user 2: periods 1,2 ; user 3: period 2
    rows = [
        (1, 1), (1, 5), (1, 12), (1, 25),   # dup inside period 0 collapses
        (2, 11), (2, 29),
        (3, 21),
    ]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, period_seconds=10).collect()
    }
    assert out == {
        (0, 0): 1, (0, 1): 1, (0, 2): 1,   # user 1
        (1, 0): 1, (1, 1): 1,              # user 2
        (2, 0): 1,                         # user 3
    }


def test_retention_cohorts_counts_distinct_users(spark):
    rows = [(u, 1) for u in range(5)] + [(u, 15) for u in range(3)]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id", F.timestamp_seconds(F.col("sec")).alias("ts")
    )
    out = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, period_seconds=10).collect()
    }
    assert out == {(0, 0): 5, (0, 1): 3}
