"""Corpus unigram language-model statistics: per-document mean
negative log-likelihood (the CCNet-style quality / domain-fit signal)
and out-of-vocabulary rate against a corpus-derived top-K vocabulary.

These are the two standard model-free quality filters of an LLM
training-data pipeline: a document whose tokens are improbable under
the corpus' own unigram distribution is likely noise/garble (high
NLL), and a document dominated by tokens outside the frequency-ranked
vocabulary is likely non-linguistic content (high OOV rate).

Reference parity: generalizes the reference's per-feature Gaussian
"how surprising is this value" scoring (anomaly_likelihood.py) from
numeric columns to token distributions — same shape (corpus-fitted
model, per-row surprise score), text-native statistics.

Scale notes (100 TB):
- One tokenizing scan of the text column, fanned out first so a
  degenerate single-file layout still parallelizes; the narrow
  (doc, term, tf) frame is persisted and every downstream frame
  (corpus counts, totals, per-doc scores) derives from it.
- The corpus unigram table is vocabulary-sized — orders of magnitude
  smaller than the corpus. The tf->corpus join is left UNHINTED:
  statistics + AQE broadcast it in practice, but a forced broadcast
  of a web-scale (>100M term) vocabulary would OOM the executors,
  while the unhinted plan degrades to a shuffle join.
- Scoring is pure column arithmetic over the joined frame (no Python,
  no window); the per-doc aggregation shuffles vocabulary-deduped
  (doc, term) rows, never raw tokens.
- NLL is rounded to 6 dp with the house +1e-9 nudge so the ranking is
  reproducible across engines and libm implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from htm_streamer_spark.operators.ranking import tokenize


def _doc_term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The shared narrow (id, term, tf) frame — one tokenizing scan."""
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    toks = tokenize(fan_out_narrow_scans(df.select(id_col, text_col)), text_col)
    return toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def unigram_nll(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus'
    own maximum-likelihood unigram model.

    P(term) = corpus_tf(term) / total_tokens;
    nll(doc) = -sum_t tf(doc,t) * ln(P(t)) / n_tokens(doc).

    Every token is in-corpus by construction (the model is fitted on
    the same corpus), so no smoothing is needed. Documents with zero
    tokens are absent from the output. Returns
    (id_col, n_tokens, nll).
    """
    tf = _doc_term_freq(df, id_col, text_col).persist()
    corpus = tf.groupBy("term").agg(F.sum("tf").cast("long").alias("ctf"))
    total = (
        tf.agg(F.sum("tf").cast("long").alias("total"))
        .withColumn("j", F.lit(1))
    )
    # total is one row — broadcast; the vocabulary-sized corpus join
    # stays unhinted (see module docstring).
    model = corpus.withColumn("j", F.lit(1)).join(F.broadcast(total), "j").drop("j")
    scored = tf.join(model, "term").withColumn(
        "_ll", F.col("tf") * F.log(F.col("ctf") / F.col("total"))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.round(-F.sum("_ll") / F.sum("tf") + F.lit(1e-9), 6).alias("nll"),
    )


def oov_rate(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 256,
) -> DataFrame:
    """Per-document out-of-vocabulary token rate against the corpus'
    top-``vocab_size`` terms by total frequency (ties broken by term
    ascending — a deterministic vocabulary on every engine).

    Returns (id_col, n_tokens, n_oov, oov) with
    oov = n_oov / n_tokens rounded to 6 dp. Token-less documents are
    absent from the output (no tokens, no rate).
    """
    tf = _doc_term_freq(df, id_col, text_col).persist()
    w = Window.orderBy(F.col("ctf").desc(), F.col("term").asc())
    # the single-partition rank window is safe exactly because its
    # input is the vocabulary-sized corpus frame, not the corpus; at
    # web scale prune first (e.g. ctf >= corpus_total/1e9) if the raw
    # vocabulary itself outgrows one task.
    vocab = (
        tf.groupBy("term")
        .agg(F.sum("tf").cast("long").alias("ctf"))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= vocab_size)
        .select("term", F.lit(1).alias("_in_vocab"))
    )
    joined = tf.join(vocab, "term", "left")
    return joined.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.sum(
            F.when(F.col("_in_vocab").isNull(), F.col("tf")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("n_oov"),
        F.round(
            F.sum(
                F.when(F.col("_in_vocab").isNull(), F.col("tf")).otherwise(F.lit(0))
            )
            / F.sum("tf")
            + F.lit(1e-9),
            6,
        ).alias("oov"),
    )


def bigram_nll(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus'
    own maximum-likelihood BIGRAM model — the order-sensitive
    companion to ``unigram_nll``: shuffled or template-stitched text
    keeps its unigram mix (unigram NLL blind) but breaks local word
    order, which conditional bigram surprise detects directly.

    ``P(cur | prev) = corpus_bf(prev, cur) / corpus_cf(prev)`` where
    ``corpus_cf(prev) = sum_cur corpus_bf(prev, cur)`` (the context
    count over observed bigrams, so the conditional sums to 1 by
    construction and every document bigram is in-model — no smoothing
    needed, same closure argument as ``unigram_nll``).

    Plan: one tokenizing scan; bigrams are built INSIDE the words
    array (a ``transform`` lambda pairing ``w[i], w[i+1]`` over a
    materialized words column — no positional self-join of the token
    stream, no second scan), then collapsed to the persisted narrow
    (doc, prev, cur, tf) frame that feeds the bigram model, the
    context totals, and the scoring join. The model joins stay
    unhinted (same web-scale-vocabulary argument as the unigram
    module). Documents with fewer than two tokens have no bigrams and
    are absent. Returns (id_col, n_bigrams, nll), 6 dp.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import TOKEN_SPLIT

    base = fan_out_narrow_scans(df.select(id_col, text_col))
    # materialize words in its own projection (plan-hygiene rule:
    # the transform lambda below references it twice)
    words = base.select(
        id_col,
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT).alias("_w"),
    )
    pairs = words.select(
        id_col,
        F.expr(
            "transform(slice(_w, 1, greatest(size(_w) - 1, 0)),"
            " (w, i) -> struct(w AS prev, _w[i + 1] AS cur))"
        ).alias("_bg"),
    )
    bg = (
        pairs.select(id_col, F.explode_outer("_bg").alias("_p"))
        .select(id_col, F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur"))
        .where(
            F.col("prev").isNotNull()
            & (F.col("prev") != "")
            & F.col("cur").isNotNull()
            & (F.col("cur") != "")
        )
    )
    tf = bg.groupBy(id_col, "prev", "cur").agg(
        F.count(F.lit(1)).alias("tf")
    ).persist()
    corpus = tf.groupBy("prev", "cur").agg(
        F.sum("tf").cast("long").alias("bf")
    )
    ctx = corpus.groupBy("prev").agg(F.sum("bf").cast("long").alias("cf"))
    scored = (
        tf.join(corpus, ["prev", "cur"])
        .join(ctx, "prev")
        .withColumn("_ll", F.col("tf") * F.log(F.col("bf") / F.col("cf")))
    )
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_bigrams"),
        F.round(-F.sum("_ll") / F.sum("tf") + F.lit(1e-9), 6).alias("nll"),
    )


def lexical_diversity(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-group type-token ratio and Herdan's C — the lexical-
    diversity collapse detector: a source whose scraped pages
    degenerate into boilerplate keeps its volume (n_tokens) while its
    vocabulary (n_types) flatlines, which TTR and Herdan's C
    (log V / log N, the length-robust variant) surface directly.
    Complements categorical_entropy (stattests.py), which watches the
    label mix rather than the text itself.

    Plan: one tokenizing scan fanned out; ``groupBy(group, term)``
    collapses to the per-group vocabulary BEFORE the per-group
    aggregate, so the second shuffle carries vocabulary-deduped rows
    (map-side partial on both). No Python, no windows. Groups with a
    single token report herdan_c NULL (log 1 == 0 denominator).
    Returns (group, n_tokens, n_types, ttr, herdan_c).
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    toks = tokenize(
        fan_out_narrow_scans(df.select(group_col, text_col)), text_col
    )
    per_term = toks.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    agg = per_term.groupBy(group_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    return agg.select(
        group_col,
        "n_tokens",
        "n_types",
        F.round(
            F.col("n_types") / F.col("n_tokens") + F.lit(1e-9), 6
        ).alias("ttr"),
        F.when(
            F.col("n_tokens") > 1,
            F.round(
                F.log(F.col("n_types").cast("double"))
                / F.log(F.col("n_tokens").cast("double"))
                + F.lit(1e-9),
                6,
            ),
        ).alias("herdan_c"),
    )


def chao_richness(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-group Chao1 vocabulary-richness estimate and Good-Turing
    sample coverage — the UNSEEN-MASS member of the vocabulary family:
    ``lexical_diversity`` measures the vocabulary you SAW; Chao1
    estimates how much you haven't (how many types a bigger crawl of
    this source would still mint), and Good-Turing coverage estimates
    the probability mass of unseen types. A source whose chao1 vastly
    exceeds n_types is under-sampled; coverage near 1 with flat chao1
    means the source's vocabulary is exhausted (more crawl = more
    duplication, not more diversity) — directly a crawl-budget signal.

    Bias-corrected Chao1 (defined even when F2 == 0)::

        chao1 = V + F1 * (F1 - 1) / (2 * (F2 + 1)),
        coverage = 1 - F1 / N

    with V = observed types, F1/F2 = types seen exactly once/twice,
    N = total tokens (Chao 1984; Good 1953).

    Plan: one tokenizing scan collapses to the per-group term-count
    frame (vocabulary-sized, map-side partial); the estimator is one
    aggregate over it. Token-less groups are absent. Returns
    (group, n_tokens, n_types, f1, f2, chao1, coverage), 6 dp.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    toks = tokenize(
        fan_out_narrow_scans(df.select(group_col, text_col)), text_col
    )
    per_term = toks.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    agg = per_term.groupBy(group_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("tf") == 2, 1).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    chao1 = (
        F.col("n_types")
        + (F.col("f1") * (F.col("f1") - 1))
        / (2.0 * (F.col("f2") + 1))
    )
    return agg.select(
        group_col,
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.round(chao1 + F.lit(1e-9), 6).alias("chao1"),
        F.round(
            F.lit(1.0) - F.col("f1") / F.col("n_tokens") + F.lit(1e-9), 6
        ).alias("coverage"),
    )


def zipf_fit(
    df: DataFrame,
    *,
    text_col: str = "text",
    top_k: int = 128,
) -> DataFrame:
    """OLS fit of ln(frequency) ~ ln(rank) over the corpus' top-K
    terms — the Zipf-law conformance check: natural language sits near
    slope -1; machine-generated spam, template farms, and tokenizer
    breakage bend the curve (slope drifting toward 0 means the head
    flattened; r2 collapsing means the rank-frequency law itself broke).
    A corpus-level quality gate, one row per corpus.

    slope = cov(x, y) / var(x) over (x, y) = (ln rank, ln ctf), with
    the rank deterministic (ctf desc, term asc). All moments are plain
    averages over the K-row frame, so the arithmetic reproduces on any
    engine to well under the 6-dp rounding.

    Plan: one tokenizing scan; the rank window runs on the vocabulary-
    sized corpus frame (same documented bound as ``oov_rate``); the
    fit aggregates K rows. Returns one row
    (n_terms, slope, intercept, r2).
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    toks = tokenize(fan_out_narrow_scans(df.select(text_col)), text_col)
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ctf"))
    w = Window.orderBy(F.col("ctf").desc(), F.col("term").asc())
    top = (
        vocab.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .select(
            F.log(F.col("_rk").cast("double")).alias("x"),
            F.log(F.col("ctf").cast("double")).alias("y"),
        )
    )
    m = top.agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    slope = cov / varx
    return m.select(
        "n_terms",
        F.round(slope + F.lit(1e-9), 6).alias("slope"),
        F.round(F.col("my") - slope * F.col("mx") + F.lit(1e-9), 6).alias(
            "intercept"
        ),
        F.when(
            vary > 0,
            F.round(cov * cov / (varx * vary) + F.lit(1e-9), 6),
        ).alias("r2"),
    )


def heaps_fit(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 32,
) -> DataFrame:
    """OLS fit of Heaps' law ``V = K * N^beta`` (ln V ~ ln N) over the
    corpus' vocabulary-growth curve — the companion invariant to
    ``zipf_fit``: Zipf checks the static rank-frequency shape, Heaps
    checks how vocabulary GROWS as the corpus grows. Natural text sits
    near beta ~ 0.4-0.6; a template farm's curve flattens (beta -> 0,
    vocabulary saturates) and tokenizer breakage steepens it
    (beta -> 1, every page mints "new" types).

    The growth curve is computed distributed via a FIRST-OCCURRENCE
    trick, not a sequential scan: documents are assigned to one of
    ``n_buckets`` prefix buckets by a deterministic md5 hash of
    ``id_col`` (a fixed random permutation of the corpus — Heaps' law
    is order-agnostic, and the hash makes the curve independent of
    ingest layout). Then

    - tokens(b)    = token count in bucket b           (one groupBy),
    - new_types(b) = #terms whose MIN bucket is b      (groupBy(term)),

    and the cumulative sums over the ``n_buckets``-row frame yield the
    (N_b, V_b) curve exactly: V at prefix b counts every term first
    seen at any bucket <= b. No global window ever touches a
    document-sized frame.

    Plan: one tokenizing scan collapses straight to the persisted
    (bucket, term, count) frame (≤ vocabulary × n_buckets rows,
    map-side partial); first-occurrence and token totals both derive
    from it, so the raw token stream is never shuffled and the text is
    read once; cumsum + OLS run on n_buckets rows. Buckets with zero
    cumulative tokens/types are excluded from
    the fit (ln undefined); with <= 1 distinct populated bucket the
    fit degenerates and reports NULL slope/r2.

    Returns one row: (n_points, beta, ln_k, r2), 6-dp rounded with the
    house +1e-9 nudge.
    """
    from htm_streamer_spark.operators.dedup import (
        fan_out_narrow_scans,
        shingle_base_hash,
    )

    toks = tokenize(
        fan_out_narrow_scans(df.select(id_col, text_col)), text_col
    )
    bucket = F.pmod(
        shingle_base_hash(F.col(id_col).cast("string"), "md5"),
        F.lit(n_buckets),
    ).alias("_b")
    # ONE pass over the tokens: collapse to the (bucket, term) count
    # frame (≤ vocabulary × n_buckets rows, map-side partial), persist
    # it, and derive BOTH curve ingredients from it — the raw token
    # stream is never shuffled and the text is scanned once
    bt = (
        toks.select(bucket, "term")
        .groupBy("_b", "term")
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    first_seen = bt.groupBy("term").agg(F.min("_b").alias("_fb"))
    new_types = first_seen.groupBy(F.col("_fb").alias("_b")).agg(
        F.count(F.lit(1)).alias("_nt")
    )
    tokens_per = bt.groupBy("_b").agg(F.sum("_c").alias("_tok"))
    # dense 0..n_buckets-1 grid so empty buckets carry the running sums
    grid = df.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("_b")
    )
    curve = (
        grid.join(tokens_per, "_b", "left")
        .join(new_types, "_b", "left")
        .fillna({"_tok": 0, "_nt": 0})
    )
    w = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, 0)
    pts = curve.select(
        F.sum("_tok").over(w).alias("_N"), F.sum("_nt").over(w).alias("_V")
    ).where((F.col("_N") > 0) & (F.col("_V") > 0))
    xy = pts.select(
        F.log(F.col("_N").cast("double")).alias("x"),
        F.log(F.col("_V").cast("double")).alias("y"),
    )
    m = xy.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.avg(F.col("x") * F.col("y")).alias("mxy"),
        F.avg(F.col("x") * F.col("x")).alias("mxx"),
        F.avg(F.col("y") * F.col("y")).alias("myy"),
    )
    cov = F.col("mxy") - F.col("mx") * F.col("my")
    varx = F.col("mxx") - F.col("mx") * F.col("mx")
    vary = F.col("myy") - F.col("my") * F.col("my")
    slope = cov / varx
    return m.select(
        "n_points",
        F.when(
            varx > 0, F.round(slope + F.lit(1e-9), 6)
        ).alias("beta"),
        F.when(
            varx > 0,
            F.round(F.col("my") - slope * F.col("mx") + F.lit(1e-9), 6),
        ).alias("ln_k"),
        F.when(
            (varx > 0) & (vary > 0),
            F.round(cov * cov / (varx * vary) + F.lit(1e-9), 6),
        ).alias("r2"),
    )


def diversity_profile(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Per-group Hill-number diversity profile of the unigram
    distribution — the EFFECTIVE-vocabulary family (Hill 1973)::

        D0 = V                    (richness: types observed)
        D1 = exp(H),  H = -sum p ln p   (perplexity of the unigram dist)
        D2 = 1 / sum p^2          (inverse Simpson: collision diversity)
        pielou_j = H / ln V       (evenness, 0..1; NULL when V == 1)

    D0 >= D1 >= D2 always; the GAP between them is the signal raw
    type counts hide: a source whose D0 grows while D1/D2 stay flat is
    minting long-tail junk tokens (OCR noise, hash fragments) around a
    fixed effective core — ``lexical_diversity``'s TTR can't separate
    that from genuine breadth, and ``chao_richness`` reads the unseen
    tail rather than the seen distribution's shape. D1 is also the
    per-source unigram perplexity: directly comparable to a tokenizer
    vocabulary budget.

    Plan: one tokenizing scan collapses to the per-(group, term) count
    frame (vocabulary-sized, map-side partial); the whole profile is
    one aggregate over it. Token-less groups are absent. Returns
    ``(group, n_tokens, d0, d1, d2, shannon, pielou_j)``, 6 dp.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    toks = tokenize(
        fan_out_narrow_scans(df.select(group_col, text_col)), text_col
    )
    per_term = toks.groupBy(group_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    tot = Window.partitionBy(group_col)
    p = F.col("tf") / F.sum("tf").over(tot)
    agg = (
        per_term.select(
            group_col,
            F.col("tf"),
            (-p * F.log(p)).alias("_h"),
            (p * p).alias("_p2"),
        )
        .groupBy(group_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("d0"),
            F.sum("_h").alias("_sh"),
            F.sum("_p2").alias("_sp2"),
        )
    )
    return agg.select(
        group_col,
        "n_tokens",
        "d0",
        F.round(F.exp(F.col("_sh")) + F.lit(1e-9), 6).alias("d1"),
        F.round(1.0 / F.col("_sp2") + F.lit(1e-9), 6).alias("d2"),
        F.round(F.col("_sh") + F.lit(1e-9), 6).alias("shannon"),
        F.round(
            F.when(F.col("d0") > 1, F.col("_sh") / F.log(F.col("d0")))
            + F.lit(1e-9),
            6,
        ).alias("pielou_j"),
    )


def topk_overlap_sources(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Pairwise Jaccard overlap of the TOP-``k`` term sets of every
    pair of groups — the head-vocabulary redundancy readout: JSD /
    Hellinger compare the full distributions (tail-sensitive, hard to
    eyeball); "do these two sources share their 100 most common
    words" is the fast triage question for near-duplicate feeds and
    language mismatches. Top-k per group by term frequency, ties
    broken by term (deterministic cross-engine).

    Jaccard uses the ACTUAL set sizes (a group with fewer than k
    distinct terms contributes its whole vocabulary), so
    ``jaccard = n_common / (k_a + k_b - n_common)``. Pairs of observed
    groups with no common head terms report 0.

    Plan: one tokenizing scan → the vocabulary-sized tf frame → one
    per-group top-k sort window (head-sized output, the accepted
    hot-group bound) → pairwise equi-join ON TERM of two k-sized
    frames (output-sensitive; never a corpus cross join). Returns
    ``(source_a, source_b, k_a, k_b, n_common, jaccard)``, 6 dp.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    g = group_col
    toks = tokenize(
        fan_out_narrow_scans(df.select(g, text_col)), text_col
    )
    tf = toks.groupBy(g, "term").agg(F.count(F.lit(1)).alias("tf"))
    w = Window.partitionBy(g).orderBy(
        F.col("tf").desc(), F.col("term").asc()
    )
    top = (
        tf.select(g, "term", F.row_number().over(w).alias("_rn"))
        .where(F.col("_rn") <= k)
        .persist()  # sizes + the pair join share it
    )
    sizes = top.groupBy(g).agg(F.count(F.lit(1)).cast("long").alias("_k"))
    a = top.select(F.col(g).alias("source_a"), "term")
    b = top.select(F.col(g).alias("source_b"), "term")
    common = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    ga = sizes.select(F.col(g).alias("source_a"), F.col("_k").alias("k_a"))
    gb = sizes.select(F.col(g).alias("source_b"), F.col("_k").alias("k_b"))
    pairs = ga.crossJoin(gb).where(F.col("source_a") < F.col("source_b"))
    out = pairs.join(common, ["source_a", "source_b"], "left")
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    return out.select(
        "source_a",
        "source_b",
        "k_a",
        "k_b",
        nc.alias("n_common"),
        F.round(
            nc / (F.col("k_a") + F.col("k_b") - nc) + F.lit(1e-9), 6
        ).alias("jaccard"),
    )
