"""Property-based parity for the round-4 operators: retention
triangles and unigram-LM NLL must match direct python references on
arbitrary hypothesis-generated inputs."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from htm_streamer_spark.operators.funnel import retention_cohorts
from htm_streamer_spark.operators.lm import unigram_nll

ev = st.fixed_dictionaries(
    {"user": st.integers(0, 4), "sec": st.integers(0, 99)}
)


def _reference_retention(rows, period_seconds=10):
    periods = defaultdict(set)
    for r in rows:
        periods[r["user"]].add(r["sec"] // period_seconds)
    out = Counter()
    for ps in periods.values():
        cohort = min(ps)
        for p in ps:
            out[(cohort, p - cohort)] += 1
    return dict(out)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(ev, min_size=1, max_size=40))
def test_retention_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(r["user"], r["sec"]) for r in rows], "user_id long, sec long"
    ).select("user_id", F.timestamp_seconds(F.col("sec")).alias("ts"))
    got = {
        (r["cohort_period"], r["period_offset"]): r["n_users"]
        for r in retention_cohorts(df, period_seconds=10).collect()
    }
    assert got == _reference_retention(rows)


doc = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "eee"]), min_size=0, max_size=8
)


def _reference_nll(docs):
    corpus = Counter()
    for toks in docs:
        corpus.update(toks)
    total = sum(corpus.values())
    out = {}
    for i, toks in enumerate(docs):
        if not toks:
            continue
        s = sum(math.log(corpus[t] / total) for t in toks)
        out[i] = (-s / len(toks), len(toks))
    return out


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(doc, min_size=1, max_size=10))
def test_unigram_nll_matches_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks), "s") for i, toks in enumerate(docs)],
        "doc_id long, text string, source string",
    )
    got = {r["doc_id"]: (r["nll"], r["n_tokens"]) for r in unigram_nll(df).collect()}
    want = _reference_nll(docs)
    assert set(got) == set(want)
    for k, (nll, n) in want.items():
        assert got[k][1] == n
        assert abs(got[k][0] - nll) < 1e-5
