"""Information-theoretic operators (operators/infotheory.py, lm.bigram_nll,
stattests.theil_sen) vs pure-python/numpy references."""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.infotheory import (
    jsd_sources,
    mutual_information,
)
from htm_streamer_spark.operators.lm import bigram_nll
from htm_streamer_spark.operators.stattests import theil_sen


# ---------------------------------------------------------------------------
# references
# ---------------------------------------------------------------------------


def _jsd_ref(texts_a, texts_b):
    """Brute-force JSD in nats from token Counters (full union, the
    textbook formula — independent of the shared-terms decomposition
    the operator uses)."""
    ca = Counter(w for t in texts_a for w in t.lower().split())
    cb = Counter(w for t in texts_b for w in t.lower().split())
    na, nb = sum(ca.values()), sum(cb.values())
    out = 0.0
    for w in set(ca) | set(cb):
        p, q = ca[w] / na, cb[w] / nb
        m = (p + q) / 2
        if p:
            out += 0.5 * p * math.log(p / m)
        if q:
            out += 0.5 * q * math.log(q / m)
    return out


def _mi_ref(xs, ys):
    """MI + marginal entropies in nats from observed pairs."""
    n = len(xs)
    cxy = Counter(zip(xs, ys))
    cx, cy = Counter(xs), Counter(ys)
    mi = sum(
        (c / n) * math.log((c / n) / ((cx[x] / n) * (cy[y] / n)))
        for (x, y), c in cxy.items()
    )
    hx = -sum((c / n) * math.log(c / n) for c in cx.values())
    hy = -sum((c / n) * math.log(c / n) for c in cy.values())
    return mi, hx, hy


def _bigram_nll_ref(docs):
    """dict doc_id -> (n_bigrams, nll) under the corpus MLE bigram
    model, from raw python loops."""
    grams = {}
    for did, text in docs:
        ws = [w for w in text.lower().split()]
        grams[did] = list(zip(ws, ws[1:]))
    corpus = Counter(g for gs in grams.values() for g in gs)
    ctx = Counter()
    for (a, _), c in corpus.items():
        ctx[a] += c
    out = {}
    for did, gs in grams.items():
        if not gs:
            continue
        nll = -sum(math.log(corpus[g] / ctx[g[0]]) for g in gs) / len(gs)
        out[did] = (len(gs), nll)
    return out


# ---------------------------------------------------------------------------
# JSD
# ---------------------------------------------------------------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "source", "text"])
    )


def test_jsd_matches_bruteforce_union_formula(spark):
    rng = np.random.default_rng(7)
    vocab_a = [f"w{i}" for i in range(40)]
    vocab_b = [f"w{i}" for i in range(20, 60)]  # half-overlapping
    rows, texts = [], {"a": [], "b": []}
    for i in range(30):
        t = " ".join(rng.choice(vocab_a, size=25))
        rows.append((i, "a", t)), texts["a"].append(t)
    for i in range(30, 60):
        t = " ".join(rng.choice(vocab_b, size=25))
        rows.append((i, "b", t)), texts["b"].append(t)
    out = jsd_sources(_docs_df(spark, rows), "source").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["source_a"], r["source_b"]) == ("a", "b")
    ref = _jsd_ref(texts["a"], texts["b"])
    assert r["jsd"] == pytest.approx(ref, abs=2e-6)
    assert 0.0 < r["jsd"] < math.log(2.0)


def test_jsd_identical_and_disjoint_extremes(spark):
    rows = [
        (0, "a", "x y z x"),
        (1, "b", "x y z x"),  # identical distribution -> 0
        (2, "c", "p q r"),    # disjoint from a/b -> ln 2
    ]
    out = {
        (r["source_a"], r["source_b"]): r
        for r in jsd_sources(_docs_df(spark, rows), "source").collect()
    }
    assert out[("a", "b")]["jsd"] == 0.0
    assert out[("a", "c")]["jsd"] == round(math.log(2.0) + 1e-9, 6)
    assert out[("a", "c")]["n_shared_terms"] == 0
    assert len(out) == 3


def test_jsd_symmetric_in_input_order(spark):
    # pair ordering is lexicographic regardless of ingest order
    rows = [(0, "zz", "a b c"), (1, "aa", "b c d")]
    out = jsd_sources(_docs_df(spark, rows), "source").collect()
    assert len(out) == 1
    assert (out[0]["source_a"], out[0]["source_b"]) == ("aa", "zz")


def test_jsd_empty_input(spark):
    df = _docs_df(spark, [(0, "a", "x")]).where("doc_id < 0")
    assert jsd_sources(df, "source").count() == 0


# ---------------------------------------------------------------------------
# mutual information
# ---------------------------------------------------------------------------


def test_mi_matches_reference_and_bounds(spark):
    rng = np.random.default_rng(11)
    x = rng.choice(["a", "b", "c"], size=2000)
    # y depends on x partially: same letter 60% of the time
    y = np.where(rng.random(2000) < 0.6, x, rng.choice(["a", "b", "c"], 2000))
    pdf = pd.DataFrame({"x": x, "y": y})
    out = mutual_information(spark.createDataFrame(pdf), "x", "y").collect()[0]
    mi, hx, hy = _mi_ref(list(x), list(y))
    assert out["mi"] == pytest.approx(mi, abs=2e-6)
    assert out["h_x"] == pytest.approx(hx, abs=2e-6)
    assert out["h_y"] == pytest.approx(hy, abs=2e-6)
    assert out["nmi"] == pytest.approx(mi / math.sqrt(hx * hy), abs=2e-6)
    assert out["n_rows"] == 2000
    assert 0 < out["mi"] <= min(hx, hy) + 1e-9


def test_mi_independent_is_zero_and_identical_is_entropy(spark):
    # product grid with equal counts -> exactly independent
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(5)]
    pdf = pd.DataFrame(rows, columns=["x", "y"])
    out = mutual_information(spark.createDataFrame(pdf), "x", "y").collect()[0]
    assert out["mi"] == 0.0 and out["nmi"] == 0.0
    # y == x -> MI == H(X), nmi == 1
    pdf2 = pd.DataFrame({"x": list("aabbc"), "y": list("aabbc")})
    out2 = mutual_information(spark.createDataFrame(pdf2), "x", "y").collect()[0]
    assert out2["mi"] == out2["h_x"] == out2["h_y"]
    assert out2["nmi"] == 1.0


def test_mi_constant_column_yields_null_nmi(spark):
    pdf = pd.DataFrame({"x": ["k"] * 10, "y": list("abcde") * 2})
    out = mutual_information(spark.createDataFrame(pdf), "x", "y").collect()[0]
    assert out["mi"] == 0.0 and out["h_x"] == 0.0
    assert out["nmi"] is None


def test_mi_empty_input_contract(spark):
    pdf = pd.DataFrame({"x": ["a"], "y": ["b"]})
    df = spark.createDataFrame(pdf).where("x = 'nope'")
    out = mutual_information(df, "x", "y").collect()
    assert len(out) == 1
    assert out[0]["n_rows"] == 0 and out[0]["n_cells"] == 0
    assert out[0]["mi"] is None


# ---------------------------------------------------------------------------
# bigram NLL
# ---------------------------------------------------------------------------


def test_bigram_nll_matches_loop_reference(spark):
    rng = np.random.default_rng(3)
    vocab = [f"t{i}" for i in range(30)]
    docs = [
        (i, " ".join(rng.choice(vocab, size=rng.integers(2, 40))))
        for i in range(50)
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in bigram_nll(spark.createDataFrame(pdf)).collect()
    }
    ref = _bigram_nll_ref(docs)
    assert set(out) == set(ref)
    for did, (n, nll) in ref.items():
        assert out[did]["n_bigrams"] == n
        assert out[did]["nll"] == pytest.approx(nll, abs=2e-6)


def test_bigram_nll_order_sensitivity_vs_unigram(spark):
    # two docs with the SAME unigram bag, one in-order / one shuffled:
    # the in-order doc's bigrams dominate the corpus counts, so it
    # scores lower bigram NLL than the scrambled twin
    base = "the quick brown fox jumps over the lazy dog " * 4
    shuffled = "fox the dog quick over jumps lazy brown the " * 4
    rows = [(i, base) for i in range(9)] + [(9, shuffled)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    out = {r["doc_id"]: r["nll"] for r in
           bigram_nll(spark.createDataFrame(pdf)).collect()}
    assert out[0] < out[9]


def test_bigram_nll_short_and_empty_docs_absent(spark):
    pdf = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["a b a b", "single", "", "a b"]}
    )
    out = {r["doc_id"]: r for r in
           bigram_nll(spark.createDataFrame(pdf)).collect()}
    assert set(out) == {0, 3}
    assert out[0]["n_bigrams"] == 3 and out[3]["n_bigrams"] == 1
    empty = bigram_nll(spark.createDataFrame(pdf).where("doc_id < 0"))
    assert empty.count() == 0


# ---------------------------------------------------------------------------
# Theil-Sen
# ---------------------------------------------------------------------------


def _ts_events(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_theil_sen_matches_numpy_median_of_slopes(spark):
    rng = np.random.default_rng(5)
    rows = []
    days = pd.date_range("2024-01-01", periods=25, freq="D")
    for d_i, d in enumerate(days):
        for _ in range(8):  # multiple rows per bucket -> bucket means
            rows.append(("a", d, 2.5 * d_i + rng.normal(0, 1.0)))
    out = theil_sen(
        _ts_events(spark, rows), "event_type", "ts", "value"
    ).collect()[0]
    # reference: numpy median over pairwise slopes of the bucket means
    pdf = pd.DataFrame(rows, columns=["event_type", "ts", "value"])
    m = pdf.groupby("ts")["value"].mean()
    x = m.index.astype("int64").to_numpy() / 1e9 / 86400.0
    y = m.to_numpy()
    sl = [
        (y[j] - y[i]) / (x[j] - x[i])
        for i in range(len(x))
        for j in range(i + 1, len(x))
    ]
    assert out["n_buckets"] == 25 and out["n_pairs"] == len(sl)
    assert out["slope"] == pytest.approx(np.median(sl), abs=2e-6)
    assert out["slope"] == pytest.approx(2.5, abs=0.3)


def test_theil_sen_robust_to_outlier_buckets(spark):
    # exact line slope 3/day with two wrecked days: median slope holds
    days = pd.date_range("2024-02-01", periods=15, freq="D")
    rows = [("a", d, 3.0 * i) for i, d in enumerate(days)]
    rows[4] = ("a", days[4], 1e6)
    rows[11] = ("a", days[11], -1e6)
    out = theil_sen(
        _ts_events(spark, rows), "event_type", "ts", "value"
    ).collect()[0]
    assert out["slope"] == pytest.approx(3.0, abs=1e-6)


def test_theil_sen_degenerate_groups(spark):
    rows = [
        ("one_bucket", "2024-01-01 03:00", 5.0),
        ("one_bucket", "2024-01-01 17:00", 7.0),  # same day -> 1 bucket
        ("two_buckets", "2024-01-01 00:00", 1.0),
        ("two_buckets", "2024-01-03 00:00", 5.0),
    ]
    out = {r["event_type"]: r for r in theil_sen(
        _ts_events(spark, rows), "event_type", "ts", "value"
    ).collect()}
    assert out["one_bucket"]["n_pairs"] == 0
    assert out["one_bucket"]["slope"] is None
    assert out["two_buckets"]["slope"] == pytest.approx(2.0, abs=1e-6)
    empty = theil_sen(
        _ts_events(spark, rows).where("value < -1"),
        "event_type", "ts", "value",
    )
    assert empty.count() == 0
