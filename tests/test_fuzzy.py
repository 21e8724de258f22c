"""Fuzzy edit-distance matching (operators/fuzzy.py): known answers,
unmatched preservation, tie-breaks, substitution-at-head soundness
(the case naive prefix blocking would lose), and the broadcast
no-shuffle-on-corpus plan."""

import pytest

from htm_streamer_spark.operators.fuzzy import fuzzy_match


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string")


def _ref(spark, names):
    return spark.createDataFrame([(n,) for n in names], "name string")


def test_known_answers_and_unmatched(spark):
    df = _df(spark, [(1, "web"), (2, "wev"), (3, "zzzzzzz"), (4, "boks")])
    ref = _ref(spark, ["web", "books", "code"])
    got = {r.doc_id: r for r in fuzzy_match(df, ref, max_dist=2).collect()}
    assert (got[1].match, got[1].dist) == ("web", 0)
    assert (got[2].match, got[2].dist) == ("web", 1)
    assert got[3].match is None and got[3].dist is None  # kept, unmatched
    assert (got[4].match, got[4].dist) == ("books", 1)


def test_head_substitution_still_matches(spark):
    # a substitution at position 1 defeats any first-char/prefix
    # blocking; the length band must NOT lose it
    df = _df(spark, [(1, "xooks")])
    ref = _ref(spark, ["books"])
    got = fuzzy_match(df, ref, max_dist=1).collect()[0]
    assert (got.match, got.dist) == ("books", 1)


def test_tie_breaks_to_lexically_smallest(spark):
    df = _df(spark, [(1, "cat")])
    ref = _ref(spark, ["cab", "car"])  # both distance 1
    got = fuzzy_match(df, ref, max_dist=2).collect()[0]
    assert (got.match, got.dist) == ("cab", 1)


def test_max_dist_zero_is_exact_match(spark):
    df = _df(spark, [(1, "web"), (2, "wec")])
    ref = _ref(spark, ["web"])
    got = {r.doc_id: r for r in fuzzy_match(df, ref, max_dist=0).collect()}
    assert (got[1].match, got[1].dist) == ("web", 0)
    assert got[2].match is None


def test_invalid_max_dist_raises(spark):
    with pytest.raises(ValueError):
        fuzzy_match(_df(spark, [(1, "a")]), _ref(spark, ["a"]), max_dist=-1)


def test_plan_broadcast_no_corpus_shuffle(spark):
    df = _df(spark, [(1, "web")])
    ref = _ref(spark, ["web"])
    plan = (
        fuzzy_match(df, ref)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
