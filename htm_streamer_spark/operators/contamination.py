"""Benchmark decontamination: find documents containing any probe
string (exact substring — the standard n-gram contamination check a
training pipeline runs against eval-set probes before training).

Two Spark-first strategies, tested equal:

- ``contaminated_pairs`` — broadcast the (small) probe table and
  nested-loop join on ``contains(text, probe)``. O(docs × probes)
  comparisons but one scan of the corpus and zero shuffle of document
  bytes; Catalyst picks BroadcastNestedLoopJoin. Right up to ~10^4
  probes.
- ``contaminated_pairs_regex`` — compile ALL probes into one
  alternation and find every match per document in a single
  ``regexp_extract_all`` pass, then hash-join matched text back to
  probe_id against the broadcast probe table. One regex-automaton scan
  per document regardless of probe count — the scale path when the
  probe set is large (the regex engine is the poor man's Aho-Corasick;
  a true multi-pattern automaton via mapInPandas would be the next
  step but needs a library this container doesn't ship).

Probes longer than a few words are near-unique, so match cardinality
is tiny; the output pair set is never the bottleneck.

A third strategy removes the one scale ceiling the first two share —
both materialize the probe set on the driver (collect for the regex,
broadcast for the nested-loop). ``contaminated_pairs_ngram`` is the
word-n-gram membership check (the GPT-3/PaLM decontamination unit is
an n-gram, 8-13 words) with NO driver collect and NO probe broadcast:

1. doc side explodes word n-grams but ships only ``(doc_id,
   xxhash64(gram))`` — 16 bytes/row — into a plain shuffle hash join
   against ``(probe_id, xxhash64(gram))``. Probe cardinality is
   unbounded; the join is an ordinary distributed equi-join.
2. the (tiny) candidate pairs join back to the corpus on doc_id and
   are CONFIRMED exactly via ``array_contains`` on the recomputed gram
   array — hash collisions only ever cost a re-check, never a wrong
   answer.

Reference analog: the referential/membership checks of the validation
layer (/root/reference/htm_streamer/validation.py) applied to raw text.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.operators.dedup import _gram_array, normalized_text


def derive_probes(
    docs: DataFrame,
    text_col: str = "text",
    every: int = 97,
    offset: int = 16,
    length: int = 32,
) -> DataFrame:
    """Deterministic probe set for tests/benchmarks: from every
    ``every``-th doc_id, the ``length``-char substring at ``offset``
    (1-based). Real pipelines load probes from the eval sets instead;
    this derivation exists so the DuckDB oracle can rebuild the exact
    same probe table from the same parquet."""
    return (
        docs.filter((F.col("doc_id") % every == 0) & (F.length(text_col) >= offset + length))
        .select(
            F.col("doc_id").alias("probe_id"),
            F.substring(F.col(text_col), offset, length).alias("probe"),
        )
    )


def contaminated_pairs(
    docs: DataFrame, probes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, probe_id): every document containing a probe substring,
    excluding the probe's own source document. Broadcast nested-loop
    join — one corpus scan, no shuffle of document bytes."""
    return (
        docs.join(
            F.broadcast(probes),
            F.contains(F.col(text_col), F.col("probe"))
            & (F.col("doc_id") != F.col("probe_id")),
        )
        .select("doc_id", "probe_id")
    )


def contaminated_pairs_regex(
    docs: DataFrame, probes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Same output as :func:`contaminated_pairs` via one alternation
    regex per document (single automaton scan, probe-count-independent
    per-row cost), then a broadcast hash join matched-text → probe_id.

    The probe list is collected to the driver to build the pattern —
    probes are a small dimension by construction (eval-set n-grams);
    the corpus side is never collected.
    """
    probe_rows = probes.select("probe").distinct().collect()
    pattern = "|".join(
        re.escape(r["probe"]) for r in sorted(probe_rows, key=lambda r: r["probe"])
    )
    if not pattern:
        return docs.sparkSession.createDataFrame([], "doc_id long, probe_id long")
    # zero-width lookahead: plain alternation CONSUMES matched text, so a
    # probe overlapping an earlier match is silently missed (e.g. probes
    # "a b" scanning "a b a b a" — or two different probes overlapping).
    # (?=(...)) matches at every position without consuming.
    matched = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.regexp_extract_all(F.col(text_col), F.lit(f"(?=({pattern}))"), 1)
            )
        ).alias("probe"),
    )
    return (
        matched.join(F.broadcast(probes), "probe")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .select("doc_id", "probe_id")
    )


def _word_array(text_col: str):
    return F.filter(
        F.split(normalized_text(F.col(text_col)), r"\s+"), lambda w: w != ""
    )


def derive_ngram_probes(
    docs: DataFrame,
    text_col: str = "text",
    every: int = 97,
    start: int = 4,
    n: int = 5,
) -> DataFrame:
    """Deterministic word-n-gram probe set: from every ``every``-th
    doc, the n words starting at 1-based word index ``start``. The
    DuckDB oracle rebuilds the identical table from the same parquet;
    real pipelines load eval-set n-grams instead."""
    words = _word_array(text_col)
    return (
        docs.filter(F.col("doc_id") % every == 0)
        .select(
            F.col("doc_id").alias("probe_id"),
            F.when(
                F.size(words) >= start + n - 1,
                F.concat_ws(" ", F.slice(words, start, n)),
            ).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )


def contaminated_pairs_ngram(
    docs: DataFrame, probes: DataFrame, text_col: str = "text", n: int = 5
) -> DataFrame:
    """(doc_id, probe_id): documents whose word-n-gram set contains a
    probe n-gram, excluding the probe's own document — exact, with no
    driver collect and no probe broadcast (see module docstring).

    Scale shape: the doc-side shuffle carries (doc_id, int64 hash) per
    DISTINCT gram per doc; the probe side shuffles its own rows; AQE is
    free to pick broadcast when one side happens to be small, but
    nothing requires it. The confirm join touches only candidate
    doc_ids and re-derives the gram array for exactly those rows."""
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    # position-slice gram stream (whole-stage codegen) instead of the
    # interpreted _gram_array+array_distinct chain (higher-order
    # functions never codegen; the per-row distinct alone was seconds
    # at sf1-scale). Within-doc duplicate grams ride through the join —
    # only probe-matching grams fan out, and ``cand`` is distinct-ed
    # anyway, so the per-doc dedup bought nothing but interpreted CPU.
    # Fan-out so a single-file layout doesn't hash on one core.
    doc_side = (
        fan_out_narrow_scans(docs.select("doc_id", text_col))
        .select("doc_id", _word_array(text_col).alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            "doc_id",
            "_t",
            F.explode(F.sequence(F.lit(1), F.size("_t") - (n - 1))).alias("_p"),
        )
        .select(
            "doc_id",
            F.xxhash64(
                F.array_join(F.slice(F.col("_t"), F.col("_p"), n), " ")
            ).alias("_h"),
        )
    )
    probe_side = probes.select(
        "probe_id", "gram", F.xxhash64("gram").alias("_h")
    )
    cand = (
        doc_side.join(probe_side, "_h")
        .filter(F.col("doc_id") != F.col("probe_id"))
        .select("doc_id", "probe_id", "gram")
        .distinct()
    )
    # exact confirm: re-derive gram STRINGS for candidate docs only and
    # equi-join on (doc_id, gram). The position-slice gram stream stays
    # inside whole-stage codegen; the previous
    # ``array_contains(_gram_array(...), gram)`` filter evaluated the
    # interpreted higher-order zip_with chain once PER CANDIDATE ROW
    # (measured 95s of a 100s query at sf1.0 on 373k candidates — the
    # confirm was 20x the rest of the plan). Same rows out: the stream
    # is deduped per (doc, gram) and cand is already distinct per
    # (doc, probe, gram), so the membership join neither drops nor
    # multiplies pairs (equivalence pinned in tests/test_contamination).
    # the candidate frame is OUTPUT-sized (a pair per contaminated
    # doc×probe) — broadcast it into the re-derived gram stream so the
    # corpus-side confirm never shuffles gram text at all (the previous
    # shape shuffled the full candidate-doc gram stream twice: a
    # dropDuplicates exchange + the confirm join's SMJ — measured as
    # the dominant stage once candidates ≈ answers on a low-entropy
    # corpus). Position duplicates multiply matched pairs and are
    # deduped on the output-sized frame instead.
    cand = cand.localCheckpoint(eager=True)
    cand_ids = cand.select("doc_id").distinct()
    cgrams = (
        fan_out_narrow_scans(docs.select("doc_id", text_col))
        .join(F.broadcast(cand_ids), "doc_id", "left_semi")
        .select("doc_id", _word_array(text_col).alias("_t"))
        .where(F.size("_t") >= n)
        .select(
            "doc_id",
            "_t",
            F.explode(
                F.sequence(F.lit(1), F.size("_t") - (n - 1))
            ).alias("_p"),
        )
        .select(
            "doc_id",
            F.array_join(F.slice(F.col("_t"), F.col("_p"), n), " ").alias("gram"),
        )
    )
    confirmed = cgrams.join(F.broadcast(cand), ["doc_id", "gram"])
    return confirmed.select("doc_id", "probe_id").distinct()


def cross_source_overlap(
    df: DataFrame,
    *,
    source_col: str = "source",
    text_col: str = "text",
    gram_n: int = 3,
    window: int = 8,
) -> DataFrame:
    """Pairwise cross-source contamination matrix over MOSS winnowing
    fingerprints — the corpus-level view the per-document probes above
    can't give: how much substring-level material do two SOURCES share?
    A scraped mirror, a dataset repackaged under a new name, or a
    benchmark leaking into a crawl all show up as an off-diagonal
    overlap far above the background. Overlap coefficient
    ``|A ∩ B| / min(|A|, |B|)`` (not Jaccard) so a small source fully
    contained in a large one scores ~1 instead of being diluted.

    Plan: one fingerprinting scan (``winnow_fingerprints``, all native
    expressions); fingerprints collapse to the DISTINCT (source, fp)
    frame before any join, which bounds every fp to at most |sources|
    rows per side — the fp↔fp equi-join fan-out is |sources|^2 per
    fingerprint worst case, independent of how many documents share
    it (the boilerplate-hot-fp hazard is bounded by construction, the
    same count-first stance as the minhash bucket gate). Per-source
    totals derive from the same distinct frame. Returns
    (source_a, source_b, n_shared_fp, n_a, n_b, overlap) for
    source_a < source_b.
    """
    from htm_streamer_spark.operators.textstats import winnow_fingerprints

    fps = winnow_fingerprints(df, text_col, gram_n=gram_n, window=window)
    sfp = (
        fps.join(df.select("doc_id", source_col), "doc_id")
        .select(F.col(source_col).alias("_s"), "fp")
        .distinct()
    )
    sfp = sfp.persist()  # totals + both join sides: one fingerprint pass
    totals = sfp.groupBy("_s").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    a = sfp.select(F.col("_s").alias("source_a"), "fp")
    b = sfp.select(F.col("_s").alias("source_b"), "fp")
    shared = (
        a.join(b, "fp")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fp"))
    )
    out = (
        shared.join(
            F.broadcast(totals.select(F.col("_s").alias("source_a"),
                                      F.col("_n").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("_s").alias("source_b"),
                                      F.col("_n").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_fp",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared_fp")
                / F.least("n_a", "n_b").cast("double")
                + F.lit(1e-9),
                6,
            ).alias("overlap"),
        )
    )
    return out
