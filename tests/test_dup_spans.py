"""dup_span_extents (operators/repetition.py): hand-built fixtures pin
the maximal-run semantics — overlapping dup grams chain into ONE span,
a gap splits, span_len_words = n_positions + n − 1, unique docs emit
nothing, and the extents are consistent with cross_doc_dup_spans'
per-doc dup counts on the same corpus."""

import pytest

from htm_streamer_spark.operators.repetition import (
    cross_doc_dup_spans,
    dup_span_extents,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i + 1, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


WORDS = [f"w{i}" for i in range(30)]


def test_shared_run_merges_into_one_span(spark):
    # docs 1 and 2 share words 5..14 (10 words) → dup 3-gram positions
    # 6..13 in doc 1 (1-based: shared block starts at word index 6) —
    # 8 consecutive positions, one span of 10 words
    shared = WORDS[5:15]
    d1 = WORDS[:5] + shared + WORDS[15:20]
    d2 = ["x1", "x2"] + shared + ["x3", "x4"]
    out = (
        dup_span_extents(_df(spark, [" ".join(d1), " ".join(d2)]), n=3)
        .orderBy("doc_id")
        .collect()
    )
    assert len(out) == 2
    a, b = out
    assert (a["doc_id"], a["span_start"], a["n_positions"], a["span_len_words"]) == (
        1, 6, 8, 10
    )
    assert (b["doc_id"], b["span_start"], b["n_positions"], b["span_len_words"]) == (
        2, 3, 8, 10
    )


def test_gap_splits_spans(spark):
    # two shared blocks separated by unique words → two spans per doc
    blk1, blk2 = WORDS[0:5], WORDS[10:15]
    d1 = blk1 + ["u1", "u2", "u3"] + blk2
    d2 = blk1 + ["v1", "v2", "v3"] + blk2
    out = (
        dup_span_extents(_df(spark, [" ".join(d1), " ".join(d2)]), n=3)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    spans = [(r["doc_id"], r["span_start"], r["span_len_words"]) for r in out]
    assert spans == [(1, 1, 5), (1, 9, 5), (2, 1, 5), (2, 9, 5)]


def test_unique_docs_emit_nothing(spark):
    d1 = " ".join(WORDS[:10])
    d2 = " ".join(f"z{i}" for i in range(10))
    assert dup_span_extents(_df(spark, [d1, d2]), n=3).count() == 0


def test_extents_sum_matches_fraction_operator(spark):
    # Σ n_positions per doc == cross_doc_dup_spans' n_dup_grams
    shared = WORDS[5:15]
    texts = [
        " ".join(WORDS[:5] + shared + WORDS[15:20]),
        " ".join(["x1", "x2"] + shared + ["x3"]),
        " ".join(["q%d" % i for i in range(12)]),
    ]
    df = _df(spark, texts)
    ext = (
        dup_span_extents(df, n=5)
        .groupBy("doc_id")
        .sum("n_positions")
        .toPandas()
        .set_index("doc_id")["sum(n_positions)"]
        .to_dict()
    )
    frac = (
        cross_doc_dup_spans(df, n=5)
        .toPandas()
        .set_index("doc_id")["n_dup_grams"]
        .to_dict()
    )
    for doc, n_dup in frac.items():
        assert ext.get(doc, 0) == n_dup


def test_partitioning_invariance(spark):
    shared = WORDS[5:15]
    texts = [" ".join(WORDS[:5] + shared), " ".join(shared + WORDS[20:25])]
    rows = set()
    for parts in (1, 7):
        df = _df(spark, texts).repartition(parts)
        got = frozenset(
            (r["doc_id"], r["span_start"], r["n_positions"])
            for r in dup_span_extents(df, n=3).collect()
        )
        rows.add(got)
    assert len(rows) == 1


def test_short_docs_skipped(spark):
    # both docs shorter than n emit no grams at all
    out = dup_span_extents(_df(spark, ["a b", "a b"]), n=5)
    assert out.count() == 0
