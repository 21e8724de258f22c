"""Exact set-similarity self-join via prefix filtering (AllPairs).

The LSH tiers in ``operators/dedup.py`` trade recall for candidate
pruning (a true near-dup pair can miss every band). This operator is
the EXACT counterpart over the SAME shingle space: every document pair
whose token-set Jaccard is >= the threshold, guaranteed — the candidate
pruning is lossless. Public recipe: Bayardo, Ma & Srikant, WWW 2007
("Scaling Up All Pairs Similarity Search") and Chaudhuri, Ganti &
Kaushik, ICDE 2006 (the SSJoin prefix filter); Vernica, Carey & Li,
SIGMOD 2010 ran the same plan on MapReduce.

Plan shape (all built-in expressions, zero Python):

1. tokenize once: per-doc DISTINCT token set — 3-gram shingles by
   default (the MinHash tier's space, so ``jaccard >= t`` here is the
   ground truth its LSH recall is measured against) or plain words;
2. global document frequency per token (one aggregation — vocabulary-
   sized output, co-partitioned with the next join on ``w``);
3. order each doc's tokens rarest-first ((df, w) — a deterministic
   total order shared by all docs) and keep only the PREFIX of length
   ``|s| - ceil(t*|s|) + 1``: two docs with Jaccard >= t overlap in at
   least ``ceil(t*|s|)`` tokens, so under any shared total order they
   MUST share a prefix token — an equi-join on prefix tokens is a
   complete candidate generator;
4. equi-join prefixes on the token, with the length filter
   ``t*|a| <= |b| and t*|b| <= |a|`` applied join-side;
5. exact confirm: ``array_intersect`` on the sorted token sets.

100-TB notes: the document-frequency frame is |vocab| rows (shuffle
join on ``w``, never collected); per-token join fan-out is quadratic in
the token's PREFIX occurrence count, and rarest-first ordering pushes
frequent tokens out of prefixes — the classic AllPairs bound (shingles
are near-unique, so prefix buckets are tiny). The worst case (a corpus
of near-identical docs) degrades toward the true pair count, i.e. the
join is output-sensitive, not input-quadratic. No sampling, no sketch,
no recall loss anywhere.

Reference parity: the reference engine has no near-dup machinery at
all (single-node HTM); this is one of the LLM-training-pipeline
additions mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import _gram_array, fan_out_narrow_scans, normalized_text

__all__ = ["token_sets", "jaccard_similarity_join"]


def token_sets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "shingles",
    n: int = 3,
) -> DataFrame:
    """(_id, ws, sz): the sorted distinct token set per document; docs
    with an empty set are dropped (they can never reach any positive
    threshold). ``mode='shingles'`` builds the same word n-grams the
    MinHash tier hashes (``dedup.shingles``); ``mode='words'`` uses the
    plain word set."""
    if mode not in ("shingles", "words"):
        raise ValueError(f"mode must be 'shingles' or 'words', got {mode!r}")
    # word array materialized in its own projection (_gram_array
    # references it 4x), and the set frame PERSISTED before the
    # emptiness filter: a filter above the derived array is otherwise
    # predicate-pushed through the projections, re-inlining the whole
    # tokenize+gram+sort chain as a per-row scan filter (measured 36
    # duplicated subtrees in the optimized plan; see dedup.shingles).
    # The cache boundary is the pushdown barrier — and every caller of
    # this frame (prefix explode, both join-backs) reuses it anyway.
    base = docs.select(
        F.col(id_col).alias("_id"),
        F.split(normalized_text(F.col(text_col)), r"\s+").alias("_ws0"),
    )
    toks = _gram_array(F.col("_ws0"), n) if mode == "shingles" else F.col("_ws0")
    ws = F.array_sort(
        F.array_distinct(F.filter(toks, lambda x: F.length(x) > 0))
    )
    sets = base.select("_id", ws.alias("ws")).persist()
    return (
        sets.withColumn("sz", F.size("ws"))
        .filter(F.col("sz") > 0)
    )


def jaccard_similarity_join(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "shingles",
    n: int = 3,
    broadcast_attach: bool = True,
) -> DataFrame:
    """All pairs (doc_a < doc_b) with token-set Jaccard >= ``threshold``,
    exact. Returns (doc_a, doc_b, jaccard) with full-precision jaccard;
    round at the presentation layer.

    ``broadcast_attach`` broadcasts the per-doc set frames into the
    verification joins (right whenever the per-doc sketch rows fit an
    executor — up to ~10^7 docs); at corpus scales beyond that pass
    False and the verify attach becomes an ordinary shuffle join."""
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")

    # token_sets persists its set frame internally (the pushdown
    # barrier); no second persist here
    sets = token_sets(fan_out_narrow_scans(docs), id_col, text_col, mode, n)
    tok = sets.select("_id", "sz", F.explode("ws").alias("w"))
    dfreq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    # rarest-first rank inside each doc; (df, w) is a total order shared
    # by every doc, the prerequisite for prefix-filter completeness
    pos = F.row_number().over(Window.partitionBy("_id").orderBy("df", "w"))
    prefix_len = F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + F.lit(1)
    prefix = (
        tok.join(dfreq, "w")
        .withColumn("pos", pos)
        .filter(F.col("pos") <= prefix_len)
        .select("_id", "sz", "w")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a._id") < F.col("b._id"))
            # length filter: jaccard >= t forces t*max(|a|,|b|) <= min
            & (F.lit(t) * F.col("a.sz") <= F.col("b.sz"))
            & (F.lit(t) * F.col("b.sz") <= F.col("a.sz")),
        )
        .select(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .distinct()
    )
    # Two-stage verify (measured 59.6s -> ~18s at sf1.0, where a low-
    # entropy corpus made the prefix filter over-generate 39.9M
    # candidates for 2,544 true pairs):
    # 1. UPPER-BOUND prefilter on 64-bit token hashes: every shared
    #    string token is a shared hash, so |hs_a ∩ hs_b| >= |ws_a ∩
    #    ws_b| and the hash-jaccard (with the exact string set sizes in
    #    the denominator) can only overestimate — the filter keeps a
    #    strict superset of the true survivors, at long-compare rather
    #    than string-compare intersection cost per candidate.
    # 2. EXACT confirm: the surviving pairs (output-sized, not
    #    candidate-sized) recompute jaccard on the string arrays —
    #    reported values never touch a hash, so collisions cost a
    #    re-check and can never change the answer.
    # The per-doc set frames ride broadcast joins so the candidate
    # stream is never shuffled by doc id (the dominant cost of the old
    # attach: two exchanges of the candidate-pair frame carrying string
    # arrays). At corpus scales where the per-doc sketch frame outgrows
    # executor memory, pass broadcast_attach=False to shuffle-join.
    hsets = sets.select(
        "_id",
        "sz",
        F.array_sort(
            F.array_distinct(F.transform("ws", lambda w: F.xxhash64(w)))
        ).alias("hs"),
    )
    ha = hsets.select(
        F.col("_id").alias("doc_a"), F.col("hs").alias("hs_a"), F.col("sz").alias("sz_a")
    )
    hb = hsets.select(
        F.col("_id").alias("doc_b"), F.col("hs").alias("hs_b"), F.col("sz").alias("sz_b")
    )
    _maybe_bc = F.broadcast if broadcast_attach else (lambda df: df)
    hinter = F.size(F.array_intersect("hs_a", "hs_b"))
    hjac = hinter / (F.col("sz_a") + F.col("sz_b") - hinter)
    surv = (
        cand.join(_maybe_bc(ha), "doc_a")
        .join(_maybe_bc(hb), "doc_b")
        .filter(hjac >= t)
        .select("doc_a", "doc_b")
    )
    wa = sets.select(
        F.col("_id").alias("doc_a"), F.col("ws").alias("ws_a"), F.col("sz").alias("sz_a")
    )
    wb = sets.select(
        F.col("_id").alias("doc_b"), F.col("ws").alias("ws_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect("ws_a", "ws_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        surv.join(_maybe_bc(wa), "doc_a")
        .join(_maybe_bc(wb), "doc_b")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "jaccard")
    )
