"""Bigram-transition JSD between sources
(operators/infotheory.py transition_jsd_sources) vs the DIRECT
definition computed in pure python — this also proves the operator's
telescoped shared-support formula equals the textbook weighted
per-context JSD including one-sided contexts."""

import math

import pandas as pd
import pytest

from htm_streamer_spark.operators.infotheory import transition_jsd_sources

LN2 = math.log(2.0)


def _trans(docs):
    bf = {}
    for d in docs:
        w = [t for t in d.strip().lower().split() if t]
        for p, c in zip(w, w[1:]):
            bf[(p, c)] = bf.get((p, c), 0) + 1
    tot = sum(bf.values())
    cf = {}
    for (p, _c), n in bf.items():
        cf[p] = cf.get(p, 0) + n
    q = {k: n / cf[k[0]] for k, n in bf.items()}
    pm = {p: n / tot for p, n in cf.items()}
    return q, pm


def _tjsd_ref(docs_a, docs_b):
    """Direct definition: D = sum_prev w(prev) * JSD(P_a(.|prev),
    P_b(.|prev)), JSD as (1/2)KL(P||M) + (1/2)KL(Q||M); one-sided
    contexts contribute w * ln 2."""
    qa, pa = _trans(docs_a)
    qb, pb = _trans(docs_b)
    d = 0.0
    for p in set(pa) | set(pb):
        w = (pa.get(p, 0.0) + pb.get(p, 0.0)) / 2.0
        if p in pa and p in pb:
            curs = {c for (pp, c) in qa if pp == p} | {
                c for (pp, c) in qb if pp == p
            }
            jsd = 0.0
            for c in curs:
                x = qa.get((p, c), 0.0)
                y = qb.get((p, c), 0.0)
                m = (x + y) / 2.0
                if x > 0:
                    jsd += (x / 2.0) * math.log(x / m)
                if y > 0:
                    jsd += (y / 2.0) * math.log(y / m)
            d += w * jsd
        else:
            d += w * LN2
    return d


def _df(spark, by_source):
    rows = []
    for s, docs in by_source.items():
        for i, t in enumerate(docs):
            rows.append({"source": s, "doc_id": f"{s}-{i}", "text": t})
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(5)


def test_transition_jsd_matches_direct_definition(spark):
    corp = {
        "a": ["the cat sat on the mat", "the dog sat on the rug", "cats eat fish"],
        "b": ["the cat ate on the mat", "a dog sat", "dogs eat meat daily"],
        "c": ["completely disjoint vocabulary here", "nothing shared at all"],
    }
    out = {
        (r["source_a"], r["source_b"]): r
        for r in transition_jsd_sources(_df(spark, corp), "source").collect()
    }
    assert len(out) == 3
    for pair in [("a", "b"), ("a", "c"), ("b", "c")]:
        ref = _tjsd_ref(corp[pair[0]], corp[pair[1]])
        assert out[pair]["tjsd"] == pytest.approx(ref, abs=2e-6), pair
    # disjoint vocabulary: zero shared bigrams, maximal divergence
    assert out[("a", "c")]["n_shared_bigrams"] == 0
    assert out[("a", "c")]["tjsd"] == pytest.approx(LN2, abs=1e-6)


def test_transition_jsd_identical_sources_is_zero(spark):
    docs = ["alpha beta gamma alpha beta", "beta gamma delta epsilon"]
    out = transition_jsd_sources(
        _df(spark, {"x": docs, "y": list(docs)}), "source"
    ).collect()
    assert len(out) == 1
    assert out[0]["tjsd"] == pytest.approx(0.0, abs=1e-6)


def test_transition_jsd_is_order_sensitive(spark):
    # same unigram multiset, different word order: the transition JSD
    # must see what a unigram comparison cannot
    nat = ["one two three four five six"] * 4
    shuf = ["four one six two five three"] * 4
    out = transition_jsd_sources(
        _df(spark, {"nat": nat, "shuf": shuf}), "source"
    ).collect()[0]
    assert out["tjsd"] > 0.5  # near-disjoint transition structure
    ref = _tjsd_ref(nat, shuf)
    assert out["tjsd"] == pytest.approx(ref, abs=2e-6)


def test_transition_jsd_short_docs_and_empty(spark):
    # single-token docs produce no bigrams; a source with ONLY such
    # docs has no transition mass and is absent from the pair list
    corp = {"a": ["hello world again"], "b": ["solo", "tokens", "only"]}
    out = transition_jsd_sources(_df(spark, corp), "source").collect()
    assert out == []
    empty = transition_jsd_sources(
        _df(spark, {"a": ["x y"]}).where("source = 'nope'"), "source"
    )
    assert empty.count() == 0
