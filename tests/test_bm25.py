"""BM25 retrieval (operators/ranking.py bm25_topk) vs a brute-force
python reference."""

import math

import pytest

from htm_streamer_spark.operators.ranking import bm25_topk

CORPUS = [
    ("d1", "fast table scan with hash join on the big table"),
    ("d2", "window merge sort sort sort"),
    ("d3", "customer table and customer order history"),
    ("d4", "hash hash hash hash hash"),
    ("d5", "slow scan"),
    ("d6", "the a of"),
]


def _bm25_ref(corpus, query, k1=1.2, b=0.75):
    docs = {d: t.lower().split() for d, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    scores = {}
    for term in sorted(set(query.lower().split())):
        dfreq = sum(1 for t in docs.values() if term in t)
        if dfreq == 0:
            continue
        idf = math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
        for d, toks in docs.items():
            tf = toks.count(term)
            if tf:
                scores[d] = scores.get(d, 0.0) + idf * tf * (k1 + 1) / (
                    tf + k1 * (1 - b + b * len(toks) / avgdl)
                )
    return {d: round(s + 1e-9, 6) for d, s in scores.items()}


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    queries = [
        ("q1", "table scan"),
        ("q2", "hash join"),
        ("q3", "customer order"),
    ]
    out = bm25_topk(df, queries, k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in queries:
        ref = _bm25_ref(CORPUS, qtext)
        got = {r["doc_id"]: r["score"] for r in by_q[qid]}
        assert got.keys() == ref.keys()
        for d in ref:
            assert got[d] == pytest.approx(ref[d], abs=2e-6)
        # ranks follow (rounded score desc, doc_id asc)
        ordered = sorted(by_q[qid], key=lambda r: r["rank"])
        expect = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))
        assert [r["doc_id"] for r in ordered] == [d for d, _ in expect]


def test_bm25_saturation_and_length_norm(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    out = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, [("q", "sort")], k=10).collect()
    }
    # tf saturation: tripling tf must score FAR below 3x a single hit
    single = _bm25_ref(CORPUS, "scan")
    assert out["d2"] < 3 * single["d5"]
    # b=0: length normalization off -> pure saturation curve
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(df, [("q", "sort")], k=10, b=0.0).collect()
    }
    assert set(flat) == {"d2"} and flat["d2"] > 0


def test_bm25_topk_cap_and_validation(spark):
    df = spark.createDataFrame(CORPUS, "doc_id string, text string")
    out = bm25_topk(df, [("q", "table hash scan sort")], k=2).collect()
    assert len(out) == 2 and [r["rank"] for r in out] == [1, 2]
    # unknown-term-only query returns no rows, doesn't crash
    assert bm25_topk(df, [("q", "zzzzz")], k=3).count() == 0
    with pytest.raises(ValueError):
        bm25_topk(df, [])
