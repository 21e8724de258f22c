"""Flesch readability (textstats.readability) and permutation entropy
(stattests.permutation_entropy) vs pure-python references."""

import math
import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest

from htm_streamer_spark.operators.stattests import permutation_entropy
from htm_streamer_spark.operators.textstats import readability


def _flesch_ref(text):
    t = text.lower()
    words = len(re.findall(r"[a-z0-9]+", t))
    sents = max(len(re.findall(r"[.!?]+", t)), 1)
    syll = len(re.findall(r"[aeiouy]+", t)) + len(
        re.findall(r"\b[b-df-hj-np-tv-xz0-9]+\b", t)
    )
    if words == 0:
        return words, sents, syll, None
    return words, sents, syll, 206.835 - 1.015 * words / sents - 84.6 * syll / words


def _docs(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]
        )
    )


def test_flesch_matches_reference_and_orders_complexity(spark):
    simple = "The cat sat on the mat. It was fun. We ran and ran."
    complex_ = (
        "Notwithstanding interdepartmental considerations, the "
        "implementation of comprehensive organizational restructuring "
        "necessitates extraordinary administrative coordination."
    )
    texts = [simple, complex_, "", "mr pqrst 7", "no punctuation here at all"]
    out = {r["doc_id"]: r for r in readability(_docs(spark, texts)).collect()}
    for i, t in enumerate(texts):
        w, s, sy, fl = _flesch_ref(t)
        r = out[i]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (w, s, sy)
        if fl is None:
            assert r["flesch"] is None
        else:
            assert r["flesch"] == pytest.approx(fl, abs=2e-6)
    # prose orders correctly: simple text reads far easier
    assert out[0]["flesch"] > 60 > -20 > out[1]["flesch"]
    # consonant-only words still get one syllable each
    assert out[3]["n_syllables"] >= out[3]["n_words"]
    # zero punctuation -> one sentence, not divide-by-zero
    assert out[4]["n_sentences"] == 1


def _events(spark, series):
    rows = []
    for g, counts in series.items():
        for i, c in enumerate(counts):
            t = pd.Timestamp("2024-07-01") + pd.Timedelta(hours=i)
            rows += [(g, t)] * int(c)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["event_type", "ts"])
    )


def _pe_ref(counts):
    pats = Counter()
    for a, x, y in zip(counts, counts[1:], counts[2:]):
        pats[(a <= x, a <= y, x <= y)] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    return n, h


def test_perm_entropy_matches_reference_extremes(spark):
    rng = np.random.default_rng(43)
    series = {
        # monotone ramp: every triple is up-up -> entropy 0
        "ramp": list(range(1, 40)),
        # noise: all 6 patterns -> entropy near ln 6
        "noise": list(rng.integers(1, 50, 80)),
        # strict alternation: two patterns -> entropy ~ ln 2
        "alt": [5 if i % 2 == 0 else 1 for i in range(40)],
    }
    # gaps: hour with zero events must enter the triples as 0
    series["gappy"] = [3, 0, 5, 0, 3, 0, 5]
    out = {
        r["event_type"]: r
        for r in permutation_entropy(
            _events(spark, series), "event_type", "ts"
        ).collect()
    }
    for g, counts in series.items():
        # zero-count hours inside the span are preserved by construction
        n, h = _pe_ref(counts)
        r = out[g]
        assert r["n_triples"] == n
        assert r["perm_entropy"] == pytest.approx(h, abs=2e-6)
        assert r["normalized"] == pytest.approx(h / math.log(6), abs=2e-6)
    assert out["ramp"]["perm_entropy"] == 0.0
    assert out["alt"]["perm_entropy"] == pytest.approx(math.log(2), abs=0.01)
    assert out["noise"]["normalized"] > 0.8


def test_perm_entropy_tie_convention_and_empty(spark):
    # constant series: ties everywhere -> single pattern (1,1,1) -> 0
    out = permutation_entropy(
        _events(spark, {"const": [2] * 10}), "event_type", "ts"
    ).collect()[0]
    assert out["perm_entropy"] == 0.0 and out["n_triples"] == 8
    df = _events(spark, {"a": [1, 2, 3]}).where("event_type = 'z'")
    assert permutation_entropy(df, "event_type", "ts").count() == 0
