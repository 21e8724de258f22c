"""Ranking (TF-IDF, postings), funnel, and scrub operators: semantics
against hand-computed oracles, boundedness of posting samples, funnel
ordering edge cases, and plan shape (no Python stages, bounded
shuffles)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.funnel import funnel_counts
from htm_streamer_spark.operators.ranking import build_postings, tfidf_top_terms
from htm_streamer_spark.operators.scrub import blocklist_pattern, scrub_stats


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana durian"),
        (2, "apple cherry cherry cherry"),
        (3, "durian"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_matches_hand_oracle(spark, docs):
    out = {
        (r.doc_id, r.rank): (r.term, r.tfidf)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    n = 4

    def idf(df):
        return math.log((n + 1) / (df + 1)) + 1

    # doc 0: apple tf=2 df=2 -> 2*idf(2); banana tf=1 df=2; cherry tf=1 df=2
    top0 = round(2 * idf(2) + 1e-9, 6)
    assert out[(0, 1)] == ("apple", top0)
    # rank-2 tie between banana and cherry (same tf, same df) -> term asc
    assert out[(0, 2)][0] == "banana"
    # doc 3: only durian, tf=1 df=2
    assert out[(3, 1)] == ("durian", round(idf(2) + 1e-9, 6))


def test_tfidf_rank_deterministic_on_ties(spark, docs):
    a = tfidf_top_terms(docs, k=3).collect()
    b = tfidf_top_terms(docs.repartition(7), k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_postings_bounded_and_sorted(spark):
    # one stopword in every doc: sample must cap at sample_ids, sorted asc
    rows = [(i, "stop word%d" % (i % 3)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.term: r for r in build_postings(docs, sample_ids=5).collect()}
    stop = out["stop"]
    assert stop.n_docs == 40 and stop.total_tf == 40
    assert stop.sample_docs == "0,1,2,3,4"
    w0 = out["word0"]
    assert w0.n_docs == 14  # docs 0,3,6,...,39
    assert w0.sample_docs == "0,3,6,9,12"


def test_funnel_order_matters(spark):
    # u1 completes in order; u2 has purchase BEFORE click (stage 3 not
    # reached); u3 signup only; u4 never signs up (clicks+purchases
    # count for nothing)
    rows = [
        (1, "u1", "signup", 1.0),
        (2, "u1", "click", 2.0),
        (3, "u1", "purchase", 3.0),
        (4, "u2", "signup", 1.0),
        (5, "u2", "purchase", 2.0),
        (6, "u2", "click", 3.0),
        (7, "u3", "signup", 5.0),
        (8, "u4", "click", 1.0),
        (9, "u4", "purchase", 2.0),
    ]
    e = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, tsd double"
    ).select("event_id", "user_id", "event_type", F.col("tsd").cast("timestamp").alias("ts"))
    out = {r.stage: r.n_users for r in funnel_counts(e, ["signup", "click", "purchase"]).collect()}
    assert out == {"signup": 3, "click": 2, "purchase": 1}


def test_funnel_single_shuffle(spark):
    e = spark.createDataFrame(
        [(1, "u", "signup", 1.0)],
        "event_id long, user_id string, event_type string, tsd double",
    ).select("event_id", "user_id", "event_type", F.col("tsd").cast("timestamp").alias("ts"))
    plan = funnel_counts(e, ["signup", "click"])._jdf.queryExecution().executedPlan().toString()
    # one exchange for the user-partitioned window; the final global agg
    # is a single-partition exchange of <= #stages rows
    n_exch = plan.count("Exchange hashpartitioning")
    assert n_exch <= 1, plan
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_scrub_counts_and_redaction(spark):
    docs = spark.createDataFrame(
        [(0, "big customer data big"), (1, "small vector"), (2, "nothing here")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_stats(docs, ["customer", "vector", "big"]).collect()}
    assert out[0].n_matches == 3 and out[0].flagged == 1
    # "big customer data big" minus 3 matches = " " + " data " -> len 7
    assert out[0].clean_len == len(" " + " data ")
    assert out[1].n_matches == 1
    assert out[2].n_matches == 0 and out[2].flagged == 0


def test_scrub_whole_word_only(spark):
    docs = spark.createDataFrame([(0, "bigger customers")], "doc_id long, text string")
    row = scrub_stats(docs, ["big", "customer"]).collect()[0]
    assert row.n_matches == 0


def test_blocklist_pattern_rejects_regex_meta():
    with pytest.raises(ValueError):
        blocklist_pattern(["a|b("])
    with pytest.raises(ValueError):
        blocklist_pattern([])


def test_funnel_rejects_repeated_stages(spark):
    e = spark.createDataFrame(
        [(1, "u", "signup", 1.0)],
        "event_id long, user_id string, event_type string, tsd double",
    ).select("event_id", "user_id", "event_type", F.col("tsd").cast("timestamp").alias("ts"))
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(e, ["signup", "signup"])
    with pytest.raises(ValueError, match="non-empty"):
        funnel_counts(e, [])
