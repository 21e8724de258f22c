"""Term ranking over a document corpus: TF-IDF scoring and inverted-
index (postings) construction.

These are the retrieval-side primitives of a training-data pipeline:
TF-IDF surfaces the most characteristic terms per document (topic
tagging, keyword filtering), and the postings table is the corpus-wide
token -> documents index used for targeted decontamination lookups and
corpus analytics.

Scale notes (100 TB):
- Tokenization is a generator expression inside the scan (explode of a
  split) — no Python, whole-stage codegen end to end.
- The term-frequency aggregation shuffles on (doc_id, term); document
  frequency is a second aggregation on term only, derived FROM the tf
  frame (one source scan total, the tf frame being far narrower than
  the raw text).
- The df -> tf join leaves the strategy to size statistics + AQE: the
  df side is vocabulary-sized (orders of magnitude smaller than the
  corpus) so it broadcasts in practice, but no hint FORCES it — a
  forced broadcast of a web-scale vocabulary (> ~100M terms) would
  OOM, while the unhinted plan degrades to a shuffle join.
- Top-k per doc is a row_number window over the (doc_id, term)-grained
  tf-idf frame: external-sortable, spillable, no collect.
- Ordering is on the ROUNDED score (6 dp) with a term tie-break, so
  the ranking is reproducible bit-for-bit across engines and libm
  implementations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_SPLIT = r"\s+"


def tokenize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Explode whitespace tokens of ``text_col`` (lowercased, empties
    dropped). Adds a ``term`` column; keeps all other columns.

    ``explode_outer``, not ``explode``: InferFiltersFromGenerate puts a
    ``size(split(...)) > 0`` filter under a plain explode and pushdown
    sinks it into the scan — re-tokenizing every row a second time just
    to evaluate the synthesized predicate (see dedup.shingles /
    winnow_fingerprints for the measured cost of this rule). The
    output-side filters below cannot push through a Generate."""
    words = F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT)
    return (
        df.withColumn("term", F.explode_outer(words))
        .where(F.col("term").isNotNull() & (F.col("term") != ""))
        .drop(text_col)
    )


def tfidf_top_terms(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF.

    score = tf * (ln((N + 1) / (df + 1)) + 1)   (sklearn's smooth idf)

    Ranking is by the 6-dp-rounded score (descending) with an
    ascending term tie-break — deterministic on every engine.
    Returns (id_col, term, rank, tfidf).
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    toks = tokenize(fan_out_narrow_scans(df.select(id_col, text_col)), text_col)
    # tf is referenced twice (df derivation + scoring): persist the
    # narrow (id, term, tf) frame so the text column is read and
    # tokenized exactly ONCE — the dominant cost at corpus scale.
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    # N counts ALL docs (token-less docs included — sklearn semantics),
    # so it reads the source, but column-pruned to id_col only.
    n_docs = df.select(F.countDistinct(id_col).alias("n")).withColumn("j", F.lit(1))
    dfreq = (
        tf.groupBy("term")
        .agg(F.countDistinct(id_col).alias("df"))
        .withColumn("j", F.lit(1))
        .join(F.broadcast(n_docs), "j")
        .drop("j")
    )
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf",
        F.round(
            F.col("tf")
            * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0)
            + F.lit(1e-9),
            6,
        ),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", F.col("rank").cast("int").alias("rank"), "tfidf")
    )


def build_postings(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sample_ids: int = 5,
) -> DataFrame:
    """Inverted index: one row per term with document frequency, total
    term frequency, and the ``sample_ids`` smallest doc ids as a
    comma-joined string (bounded — never a full posting list in one
    row, the same cap discipline as dedup digests).

    The per-term sample is selected with a row_number window over the
    (term, doc) frame BEFORE any collect_list, so no intermediate
    array ever exceeds ``sample_ids`` elements even for a stopword
    appearing in every document of a 100 TB corpus.
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    toks = tokenize(fan_out_narrow_scans(df.select(id_col, text_col)), text_col)
    # three downstream references (window rank, totals, sample):
    # persist the narrow per-doc frame — one tokenizing scan total.
    per_doc = toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf")).persist()
    w = Window.partitionBy("term").orderBy(F.col(id_col).asc())
    ranked = per_doc.withColumn("rn", F.row_number().over(w))
    totals = per_doc.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tf").cast("long").alias("total_tf"),
    )
    sample = (
        ranked.where(F.col("rn") <= sample_ids)
        .groupBy("term")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", id_col))),
                    lambda s: s[id_col].cast("string"),
                ),
                ",",
            ).alias("sample_docs")
        )
    )
    return totals.join(sample, "term").select(
        "term", "n_docs", "total_tf", "sample_docs"
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval: the top-``k`` documents per query — the
    RETRIEVAL member of this module (``tfidf_top_terms`` tags terms per
    doc; ``build_postings`` builds the index; BM25 answers "which docs
    match this query", the lookup a decontamination or curation
    pipeline runs against the corpus). Robertson/Sparck Jones weights
    in the Lucene positivity form::

        idf_t      = ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
        score(d,q) = sum_{t in q} idf_t * tf * (k1 + 1)
                                  / (tf + k1 * (1 - b + b * dl/avgdl))

    over DISTINCT query terms (standard short-query BM25 ignores query
    term frequency). The collection is the set of docs with at least
    one token: N, df and avgdl are all derived from the SAME persisted
    (doc, term, tf) frame — one tokenizing scan total.

    Scale: ``queries`` is a benchmark-sized literal list; its distinct
    terms broadcast, and the equi-join prunes the tf frame to query
    terms BEFORE any scoring work — at corpus scale only the postings
    of the query vocabulary survive the shuffle. Per-doc length joins
    back on the pruned candidate set only. Ranking is by the 6-dp
    ROUNDED score with a doc-id tie-break — reproducible across
    engines. Returns (query_id, id_col, rank, score).
    """
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    if not queries:
        raise ValueError("queries must be a non-empty list of (id, text)")
    spark = df.sparkSession
    q_rows = [
        (qid, term)
        for qid, text in queries
        for term in sorted({t for t in text.lower().split() if t})
    ]
    qterms = spark.createDataFrame(q_rows, "query_id string, term string")

    toks = tokenize(fan_out_narrow_scans(df.select(id_col, text_col)), text_col)
    # tf feeds collection stats, doc lengths, df AND scoring: persist
    # the narrow frame so the text is read and tokenized exactly once.
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
    dl = tf.groupBy(id_col).agg(F.sum("tf").cast("double").alias("dl"))
    stats = dl.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    ).withColumn("j", F.lit(1))
    cand = tf.join(F.broadcast(qterms), "term")
    dfreq = (
        cand.groupBy("query_id", "term")
        .agg(F.countDistinct(id_col).cast("double").alias("df"))
    )
    scored = (
        cand.join(F.broadcast(dfreq), ["query_id", "term"])
        .join(dl, id_col)
        .withColumn("j", F.lit(1))
        .join(F.broadcast(stats), "j")
        .withColumn(
            "_contrib",
            F.log(
                1.0
                + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("_contrib") + F.lit(1e-9), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.col("rank").cast("int").alias("rank"),
            "score",
        )
    )
