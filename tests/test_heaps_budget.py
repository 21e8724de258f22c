"""Heaps'-law growth fit (operators/lm.py heaps_fit) and token-budget
Pareto accounting (operators/textstats.py token_budget) vs numpy/hand
references."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.lm import heaps_fit
from htm_streamer_spark.operators.textstats import token_budget


def _bucket(doc_id, n_buckets=32):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return h % 2147483647 % n_buckets


def _heaps_ref(docs, n_buckets=32):
    """Replicate the operator's first-occurrence curve + OLS in numpy."""
    tok_per = np.zeros(n_buckets, dtype=np.int64)
    first = {}
    for doc_id, text in docs:
        b = _bucket(doc_id, n_buckets)
        toks = text.lower().strip().split()
        tok_per[b] += len(toks)
        for t in toks:
            if t not in first or b < first[t]:
                first[t] = b
    new_types = np.zeros(n_buckets, dtype=np.int64)
    for b in first.values():
        new_types[b] += 1
    N = np.cumsum(tok_per)
    V = np.cumsum(new_types)
    mask = (N > 0) & (V > 0)
    x, y = np.log(N[mask].astype(float)), np.log(V[mask].astype(float))
    mx, my = x.mean(), y.mean()
    varx = (x * x).mean() - mx * mx
    cov = (x * y).mean() - mx * my
    beta = cov / varx
    return len(x), beta, my - beta * mx


def _docs(rng, n_docs=300, vocab_growth=True):
    docs = []
    for i in range(n_docs):
        # growing vocabulary: later ids can mint new words
        vocab_hi = 20 + (i if vocab_growth else 0)
        words = [f"w{rng.integers(0, vocab_hi)}" for _ in range(30)]
        docs.append((i, " ".join(words)))
    return docs


class TestHeapsFit:
    def test_matches_numpy_reference(self, spark):
        docs = _docs(np.random.default_rng(3))
        df = spark.createDataFrame(
            pd.DataFrame(docs, columns=["doc_id", "text"])
        )
        row = heaps_fit(df, n_buckets=32).collect()[0]
        n_ref, beta_ref, lnk_ref = _heaps_ref(docs)
        assert row["n_points"] == n_ref
        assert row["beta"] == pytest.approx(beta_ref, abs=1e-5)
        assert row["ln_k"] == pytest.approx(lnk_ref, abs=1e-5)
        assert 0 < row["beta"] < 1  # natural-ish growth

    def test_saturated_vocabulary_flattens(self, spark):
        # fixed 10-word vocabulary: V saturates, beta ~ 0
        rng = np.random.default_rng(5)
        docs = [
            (i, " ".join(f"w{rng.integers(0, 10)}" for _ in range(30)))
            for i in range(200)
        ]
        row = heaps_fit(
            spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"])),
            n_buckets=32,
        ).collect()[0]
        assert abs(row["beta"]) < 0.05

    def test_layout_independent(self, spark):
        # the hash bucketing makes the fit independent of partitioning
        docs = _docs(np.random.default_rng(11), n_docs=150)
        pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
        a = heaps_fit(
            spark.createDataFrame(pdf).repartition(1), n_buckets=32
        ).collect()[0]
        b = heaps_fit(
            spark.createDataFrame(pdf.iloc[::-1]).repartition(13), n_buckets=32
        ).collect()[0]
        assert (a["beta"], a["ln_k"], a["r2"]) == (b["beta"], b["ln_k"], b["r2"])

    def test_single_populated_bucket_degenerates_null(self, spark):
        df = spark.createDataFrame(
            pd.DataFrame([(0, "a b c")], columns=["doc_id", "text"])
        )
        row = heaps_fit(df, n_buckets=32).collect()[0]
        assert row["n_points"] >= 1
        assert row["beta"] is None and row["r2"] is None


class TestTokenBudget:
    def test_hand_computed_pareto(self, spark):
        rows = []
        for src, n in [("s1", 50), ("s2", 30), ("s3", 15), ("s4", 5)]:
            rows.append({"source": src, "text": " ".join(["t"] * n)})
        out = (
            token_budget(spark.createDataFrame(pd.DataFrame(rows)))
            .toPandas()
            .set_index("source")
        )
        assert out.loc["s1", "share"] == pytest.approx(0.5, abs=1e-6)
        assert out.loc["s2", "cum_share"] == pytest.approx(0.8, abs=1e-6)
        # minimal prefix reaching 80%: s1+s2 (s3's preceding mass is
        # exactly 0.8, not < 0.8)
        assert out["in_top"].to_dict() == {
            "s1": True, "s2": True, "s3": False, "s4": False
        }

    def test_tie_broken_by_source_name(self, spark):
        rows = [
            {"source": "b", "text": "x y"},
            {"source": "a", "text": "p q"},
        ]
        out = token_budget(
            spark.createDataFrame(pd.DataFrame(rows)), threshold=0.5
        ).toPandas().set_index("source")
        # equal mass: 'a' sorts first, alone reaches 50%
        assert bool(out.loc["a", "in_top"]) and not bool(out.loc["b", "in_top"])

    def test_empty_text_counts_zero(self, spark):
        rows = [
            {"source": "a", "text": "one two three"},
            {"source": "b", "text": "   "},
        ]
        out = token_budget(
            spark.createDataFrame(pd.DataFrame(rows))
        ).toPandas().set_index("source")
        assert out.loc["b", "n_tokens"] == 0
        assert out.loc["a", "share"] == pytest.approx(1.0, abs=1e-6)
