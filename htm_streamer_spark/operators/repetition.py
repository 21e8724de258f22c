"""Repetition / boilerplate detection over the documents table.

Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
Models", App. A1.1): the fraction of a document made of its most
frequent n-gram, and the duplicate-n-gram fraction. Both are standard
pre-training quality filters; a doc whose top bigram covers >18% of
tokens is boilerplate with high probability.

Spark-first shapes:

- ``dup_ngram_stats`` is pure array expressions (codegen, zero
  shuffle): one pass computes per-row gram counts and distinct counts.
- ``top_ngram`` needs per-(doc, gram) frequencies, which is a genuine
  aggregation: explode → two-phase hash agg (map-side partial combine
  means the shuffle carries one row per DISTINCT (doc, gram), not one
  per occurrence) → per-doc argmax via ``max_by`` with a deterministic
  struct tie-break. No window, one shuffle on doc_id-prefixed keys —
  the same shape at 100 TB, where gram cardinality per doc is bounded
  by doc length.

Reference analog: the per-feature frequency/quality gates of the
validation layer (/root/reference/htm_streamer/validation.py) applied
to text features rather than numeric ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from htm_streamer_spark.operators.dedup import (
    _gram_array,
    fan_out_narrow_scans,
    normalized_text,
)


def _words(text_col: str):
    return F.split(normalized_text(F.col(text_col)), r"\s+")


def dup_ngram_stats(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """(doc_id, n_grams, n_distinct_grams, dup_frac): duplicate word
    n-gram fraction per document, all native array expressions.

    dup_frac = 1 - distinct/total over the doc's n-gram multiset; 0.0
    for docs shorter than n words. ``array_distinct`` is O(g^2) in
    Spark's interpreted HOF evaluator but g is per-document (bounded by
    doc length), never per-corpus — this does not grow with table size.
    """
    # words and grams each materialized in their own projection: the
    # gram chain references words 4x and the stats reference grams 3x —
    # inlined, the tokenizer would run 12x per row (CollapseProject
    # keeps expensive multi-referenced aliases separate)
    base = df.select("doc_id", _words(text_col).alias("_ws"))
    gr = base.select(
        "doc_id", _gram_array(F.col("_ws"), n).alias("_g")
    )
    counts = gr.select(
        "doc_id",
        F.size("_g").cast("long").alias("n_grams"),
        F.size(F.array_distinct("_g")).cast("long").alias("n_distinct_grams"),
    )
    return counts.select(
        "doc_id",
        "n_grams",
        "n_distinct_grams",
        F.when(
            F.col("n_grams") > 0,
            (F.col("n_grams") - F.col("n_distinct_grams")) / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .cast("double")
        .alias("dup_frac"),
    )


def cross_doc_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, n_grams, n_dup_grams, dup_span_frac): the fraction of a
    document's word n-gram POSITIONS whose gram also occurs in at least
    ``min_docs`` distinct documents — the span-level cross-document
    duplication signal of Lee et al. 2021 ("Deduplicating Training Data
    Makes Language Models Better"), at n-gram rather than suffix-array
    granularity. Complements the doc-level tiers (MinHash/SimHash) and
    the within-doc ``dup_ngram_stats``: a doc can be globally unique yet
    80% boilerplate spans.

    Docs with fewer than ``n`` words emit no grams and are absent from
    the output (no spans to measure).

    Plan (100-TB shape): ONE tokenizing scan feeds a persisted narrow
    (doc_id, gh) frame — gram identity is a 60-bit engine-portable
    md5-prefix hash, so the shuffles never carry gram text. Doc
    frequency = dropDuplicates(doc, gh) → groupBy(gh).count(): both
    stages partial-combine map-side, so a boilerplate gram present in
    10^6 docs never concentrates pre-aggregation rows on one task. The
    join back to positions is 1-to-N on gh with the single dim row on
    the build side (AQE skew-join splits any hot partition). Final
    per-doc rollup shuffles one row per position — all-integer columns.
    At real scale widen gh to a 128-bit hash; 60 bits is the portable
    oracle-checkable form.
    """
    # Gram stream in the chunking.py shape — explode positions, slice
    # the SHARED token array, join, hash — deliberately NOT the
    # zip_with chain (_gram_array): higher-order functions run in the
    # interpreted evaluator outside whole-stage codegen, and measured
    # 23s for 5M grams WITHOUT scaling across cores; this codegen form
    # does the same grams in ~2s and scales with the scan.
    words = _words(text_col)
    gram = F.array_join(F.slice(F.col("_t"), F.col("_p"), n), " ")
    gh = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    grams = (
        fan_out_narrow_scans(df.select("doc_id", text_col))
        .select("doc_id", words.alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            "doc_id",
            "_t",
            F.explode(F.sequence(F.lit(1), F.size("_t") - (n - 1))).alias("_p"),
        )
        .select("doc_id", gh.alias("gh"))
        .persist()
    )
    # join ONLY against the duplicated-gram dim (ndocs >= min_docs):
    # non-dup grams contributed nothing but join traffic — the total
    # position count comes from the gram frame alone, and the dup
    # count from the (much smaller) filtered join; identical counts,
    # one full-vocab join less
    dupfreq = (
        grams.dropDuplicates(["doc_id", "gh"])
        .groupBy("gh")
        .agg(F.count("*").alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
        .select("gh")
    )
    tot = grams.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_grams"))
    ndup = (
        grams.join(dupfreq, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_dup_grams"))
    )
    out = (
        tot.join(ndup, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_dup_grams",
            (F.col("n_dup_grams") / F.col("n_grams")).cast("double").alias("dup_span_frac"),
        )
    )
    # Materialize the per-doc rollup (narrow: doc_id + 3 numbers — a
    # ~100× reduction from the position-level gram frame) so the
    # corpus-sized gram cache is released here rather than pinned for
    # the session lifetime.
    out = out.localCheckpoint(eager=True)
    grams.unpersist()
    return out


def dup_span_extents(
    df: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 2,
) -> DataFrame:
    """(doc_id, span_start, n_positions, span_len_words): the MAXIMAL
    cross-document duplicated runs per doc — the actual "cut this
    range" output of substring-level dedup (Lee et al. 2021 §4 removes
    the duplicated spans, not the documents), where
    ``cross_doc_dup_spans`` only scores the per-doc fraction.

    A word position p (1-based) is duplicated when the n-gram starting
    at p occurs in ≥ ``min_docs`` distinct docs; consecutive duplicated
    positions merge into one span (overlapping grams chain), covering
    words [span_start, span_start + span_len_words - 1] with
    ``span_len_words = n_positions + n − 1``. Docs with no duplicated
    position emit nothing.

    Plan: the same ONE tokenizing scan → narrow (doc_id, p, gh) frame
    as the fraction operator (gram identity = 60-bit md5 prefix, so no
    gram text ever shuffles); doc frequency is two map-side-combinable
    stages; the span merge is the gaps-and-islands window (p − row
    number is constant within a run) partitioned by doc_id — one
    shuffle of integer triples, bounded per doc by doc length. Same
    shape at 100 TB.
    """
    words = _words(text_col)
    gram = F.array_join(F.slice(F.col("_t"), F.col("_p"), n), " ")
    gh = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    grams = (
        fan_out_narrow_scans(df.select("doc_id", text_col))
        .select("doc_id", words.alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            "doc_id",
            "_t",
            F.explode(F.sequence(F.lit(1), F.size("_t") - (n - 1))).alias("_p"),
        )
        .select("doc_id", F.col("_p").cast("long").alias("_p"), gh.alias("gh"))
        .persist()
    )
    docfreq = (
        grams.dropDuplicates(["doc_id", "gh"])
        .groupBy("gh")
        .agg(F.count("*").alias("ndocs"))
        .where(F.col("ndocs") >= min_docs)
    )
    dup_pos = grams.join(docfreq, "gh").select("doc_id", "_p")
    w = Window.partitionBy("doc_id").orderBy("_p")
    isl = dup_pos.withColumn("_isl", F.col("_p") - F.row_number().over(w))
    out = (
        isl.groupBy("doc_id", "_isl")
        .agg(
            F.min("_p").alias("span_start"),
            F.count("*").cast("long").alias("n_positions"),
        )
        .select(
            "doc_id",
            "span_start",
            "n_positions",
            (F.col("n_positions") + F.lit(n - 1)).cast("long").alias("span_len_words"),
        )
    )
    # Materialize the span-sized result (output-sensitive: only docs
    # with duplicated runs emit rows) so the corpus-sized gram cache can
    # be released NOW instead of pinning position×8-byte blocks for the
    # session lifetime. The checkpointed result is tiny; losing its
    # blocks re-runs this operator, not a corpus scan.
    out = out.localCheckpoint(eager=True)
    grams.unpersist()
    return out


def top_ngram(df: DataFrame, text_col: str = "text", n: int = 2) -> DataFrame:
    """(doc_id, top_gram, top_count, n_grams, top_frac): the most
    frequent word n-gram per document and the fraction of the doc's
    grams it accounts for. Ties break to the lexically smallest gram
    (deterministic, oracle-reproducible).

    Plan: explode grams → groupBy(doc_id, gram).count() (partial
    map-side combine) → groupBy(doc_id).max_by(struct) — two hash
    aggregations sharing the doc_id-prefixed shuffle; AQE coalesces.
    """
    # words materialized first (the gram chain references them 4x);
    # explode_OUTER so InferFiltersFromGenerate can't synthesize a
    # size(_g) > 0 predicate that pushdown would re-inline through the
    # projections as a per-row filter (see dedup.shingles)
    base = df.select("doc_id", _words(text_col).alias("_ws"))
    grams = base.select(
        "doc_id", _gram_array(F.col("_ws"), n).alias("_g")
    )
    per_gram = (
        grams.select("doc_id", F.explode_outer("_g").alias("gram"))
        .filter(F.col("gram").isNotNull())
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    # argmax with lexical tie-break: max of (cnt, inverted-gram) is not
    # expressible; min of struct(-cnt, gram) is and picks (max cnt,
    # min gram).
    best = per_gram.groupBy("doc_id").agg(
        F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("gram").alias("g"))).alias("b"),
        F.sum("cnt").alias("n_grams"),
    )
    return best.select(
        "doc_id",
        F.col("b.g").alias("top_gram"),
        (-F.col("b.nc")).cast("long").alias("top_count"),
        F.col("n_grams").cast("long").alias("n_grams"),
        ((-F.col("b.nc")) / F.col("n_grams")).cast("double").alias("top_frac"),
    )
