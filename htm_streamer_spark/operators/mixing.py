"""Training-data mixture planning: per-source token accounting and the
sampling rates / epoch factors needed to hit a target token budget.

Every large-scale LLM training run mixes heterogeneous sources
(web crawl, code, books, ...) to a target proportion measured in
TOKENS, not documents. This operator computes, per source: document
and token totals, the source's share of a uniform target mixture, the
capped sampling rate (downsample-only, rate <= 1) and the uncapped
epoch factor (>1 means the source must be repeated to meet its
target — the standard "epochs" notion of data-mixing recipes).

Reference parity: the reference's per-source coverage accounting
(referential labels source, SURVEY §2 S9) counts rows per source; this
extends the same group-by-source shape to token-weighted planning.

Scale notes (100 TB):
- ONE scan of (source, text); tokens are counted with a codegen'd
  size(filter(split(...))) expression — the text column never leaves
  the scan stage, no explode, no Python.
- The aggregation is a map-side-combinable groupBy on source
  (cardinality: number of sources, i.e. tiny); the corpus-wide total
  joins back via a broadcast of ONE row.
- Output cardinality = number of sources; every downstream arithmetic
  is driver-free column math on that tiny frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from htm_streamer_spark.operators.textstats import token_count_col


def apply_mixture_sample(
    df: DataFrame,
    *,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "mixture-v1",
    method: str = "md5",
) -> DataFrame:
    """Materialize the mixture plan: keep each document with its
    source's capped sampling rate, decided by the repo-standard
    deterministic content-hash coin (stable across runs, retries and
    partitionings — the same doc is always kept or always dropped;
    see operators/sampling.py for why never rand()).

    The per-source rate table broadcasts (|sources| rows) and the keep
    decision is a codegen'd filter — ONE pass over the corpus beyond
    the planning aggregation itself. The rate->cutoff conversion uses
    an explicit floor so both engines truncate identically (a bare
    double->long cast rounds in DuckDB but truncates in Spark).

    Returns the kept (id_col, source_col) rows.
    """
    from htm_streamer_spark.operators.sampling import HASH_BUCKETS, hash_bucket

    plan = mixture_weights(
        df, budget_tokens=budget_tokens, source_col=source_col, text_col=text_col
    ).select(source_col, "rate")
    cut = F.floor(F.col("rate") * F.lit(HASH_BUCKETS)).cast("long")
    coin = hash_bucket(F.col(id_col), salt, method)
    return (
        df.select(id_col, source_col)
        .join(F.broadcast(plan), source_col)
        .where(coin < cut)
        .select(id_col, source_col)
    )


def mixture_weights(
    df: DataFrame,
    *,
    budget_tokens: int,
    source_col: str = "source",
    text_col: str = "text",
    target_shares: dict[str, float] | None = None,
) -> DataFrame:
    """Per-source mixture plan. Default target is uniform over the
    sources present; pass ``target_shares`` (source -> fraction,
    summing to ~1 — e.g. {'web': .6, 'code': .3, 'books': .1}) for the
    non-uniform mixes real training recipes use. A source absent from
    ``target_shares`` gets share 0 (rate 0 — excluded from the mix).

    target_tokens(source) = budget_tokens * share(source);
    rate  = min(1, target_tokens / n_tokens)   (downsample-only)
    epochs = target_tokens / n_tokens          (uncapped repeat factor)

    Returns (source_col, n_docs, n_tokens, target_tokens, rate,
    epochs); floats rounded to 6 dp with the house +1e-9 nudge.
    """
    if target_shares is not None:
        total = sum(target_shares.values())
        if abs(total - 1.0) > 1e-6:
            raise ValueError(f"target_shares must sum to 1, got {total}")
    # persisted: referenced twice (rows + n_sources count) — without it
    # the count branch re-scans and re-tokenizes the whole corpus for a
    # frame of |sources| rows.
    per_source = (
        df.select(source_col, token_count_col(text_col).alias("_ntok"))
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_ntok").cast("long").alias("n_tokens"),
        )
        .persist()
    )
    if target_shares is None:
        n_sources = (
            per_source.agg(F.count(F.lit(1)).cast("long").alias("_n_sources"))
            .withColumn("j", F.lit(1))
        )
        planned = per_source.withColumn("j", F.lit(1)).join(
            F.broadcast(n_sources), "j"
        )
        target = F.lit(float(budget_tokens)) / F.col("_n_sources")
    else:
        # literal CASE map — |sources| branches, folded in codegen
        share = F.lit(0.0)
        for src, frac in sorted(target_shares.items()):
            share = F.when(F.col(source_col) == src, F.lit(float(frac))).otherwise(
                share
            )
        planned = per_source
        target = F.lit(float(budget_tokens)) * share
    return planned.select(
        source_col,
        "n_docs",
        "n_tokens",
        F.round(target + F.lit(1e-9), 6).alias("target_tokens"),
        F.round(
            F.least(F.lit(1.0), target / F.col("n_tokens")) + F.lit(1e-9), 6
        ).alias("rate"),
        F.round(target / F.col("n_tokens") + F.lit(1e-9), 6).alias("epochs"),
    )


def ess_weights(
    df: DataFrame,
    group_col: str,
    weight_col,
) -> DataFrame:
    """Per-group effective sample size of a weighting scheme (Kish)::

        ess = (sum w)^2 / sum(w^2),   ess_ratio = ess / n

    The honesty check on any weighted sample or mixture: a source
    whose importance/length weights are wildly uneven contributes far
    fewer EFFECTIVE examples than its row count claims — ess_ratio
    near 1 means the weights are benign, near 1/n means one row is
    the whole sample. Rows with NULL or negative weights are excluded
    (a negative weight is a bug upstream, not a sample). Zero-weight
    rows count toward n_rows but not toward the ESS mass.

    One combinable aggregate — a single shuffle of |groups| rows.
    Returns ``(group, n_rows, sum_w, ess, ess_ratio)``, 6 dp.
    """
    g = group_col
    w = weight_col.cast("double")
    agg = (
        df.where(w.isNotNull() & (w >= 0))
        .groupBy(g)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(w).alias("_sw"),
            F.sum(w * w).alias("_sww"),
        )
    )
    ess = F.try_divide(F.col("_sw") * F.col("_sw"), F.col("_sww"))
    r6 = lambda c: F.round(c + F.lit(1e-9), 6)  # noqa: E731
    return agg.select(
        g,
        "n_rows",
        r6(F.col("_sw")).alias("sum_w"),
        r6(ess).alias("ess"),
        r6(F.try_divide(ess, F.col("n_rows").cast("double"))).alias(
            "ess_ratio"
        ),
    )


def weighted_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Per-group WEIGHTED quantiles of ``value_col`` under
    ``weight_col`` mass: the smallest value whose cumulative weight
    reaches q of the group total (lower weighted quantile, the
    inverse-CDF convention).

    Token-weighted quantiles are the curation readout that row-counted
    quantiles misreport: the plain median doc LENGTH says where half
    the DOCUMENTS are, the token-weighted median says where half the
    TRAINING TOKENS are — on a heavy-tailed corpus the two differ by
    orders of magnitude, and budget decisions follow the token mass,
    not the row count. (The mass-weighted member of the A1 quantile
    family; ``ess_weights`` above is the same weights column's honesty
    check.)

    Rows with NULL value or NULL/non-positive weight are excluded
    (zero-weight rows carry no mass — they cannot move a mass
    quantile). Returns one row per (group, q): ``(group, q, wq,
    total_w)``.

    Plan: one per-group sort window carrying the running weight sum
    (value-ordered, id-free — ties in value share a cumulative mass
    prefix, and the SELECTED value is tie-order independent by
    construction), then ONE combinable groupBy with a conditional
    ``min(value where cum >= q·total)`` column per q — no per-q explode
    of the fact table; the (group, q) unpivot runs on the groups-sized
    result. The window is per-GROUP (sorts partition by group), the
    same accepted bound as every other per-series window in the engine.
    """
    from pyspark.sql import Window

    for q in qs:
        if not 0.0 < q <= 1.0:
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    g = group_col
    v = F.col(value_col).cast("double")
    w = F.col(weight_col).cast("double")
    rows = df.select(F.col(g).alias("_g"), v.alias("_v"), w.alias("_w")).where(
        F.col("_v").isNotNull() & F.col("_w").isNotNull() & (F.col("_w") > 0)
    )
    win = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("_g")
    cum = rows.select(
        "_g",
        "_v",
        F.sum("_w").over(win).alias("_cw"),
        F.sum("_w").over(tot).alias("_tw"),
    )
    per = cum.groupBy("_g").agg(
        F.max("_tw").alias("_twx"),
        *[
            F.min(
                F.when(
                    F.col("_cw") >= F.lit(float(q)) * F.col("_tw"), F.col("_v")
                )
            ).alias(f"_wq{i}")
            for i, q in enumerate(qs)
        ],
    )
    stacked = per.select(
        "_g",
        "_twx",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(float(q)).alias("q"), F.col(f"_wq{i}").alias("wq")
                    )
                    for i, q in enumerate(qs)
                ]
            )
        ).alias("_s"),
    )
    return stacked.select(
        F.col("_g").alias(g),
        F.col("_s.q").alias("q"),
        F.col("_s.wq").alias("wq"),
        F.round(F.col("_twx") + F.lit(1e-9), 6).alias("total_w"),
    )
