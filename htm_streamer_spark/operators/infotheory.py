"""Information-theoretic corpus comparison: pairwise Jensen-Shannon
divergence between per-source unigram distributions, and mutual
information between two categorical columns of a fact table.

Both answer the validation engine's "did the mix change / are these
fields coupled" questions with distribution-level statistics rather
than per-column moments:

- ``jsd_sources``: how far apart are two sources' vocabularies as
  probability distributions? JSD is symmetric, bounded (0..ln 2 nats),
  and defined even on disjoint supports — the standard corpus-drift /
  source-redundancy measure for mixing decisions (a pair near 0 is
  redundant; a source whose JSD to every other source grows over time
  is drifting).
- ``mutual_information``: how much does knowing one categorical column
  tell you about another (e.g. event_type vs hour-of-day)? MI == 0 iff
  independent; the normalized variant is comparable across tables. A
  schema-validation companion to the functional-dependency check
  (stattests.fd_violations): FD is the exact-determinism extreme, MI
  measures partial coupling.

Reference parity: generalizes the reference's single-column
distribution drift (KL/PSI vs a checkpointed baseline,
htm_streamer/utils/anomaly_likelihood.py's model-vs-observation shape)
to BETWEEN-GROUP and BETWEEN-COLUMN comparisons, reusing the same
histogram machinery.

Scale notes (100 TB):
- ``jsd_sources`` never materializes a per-pair full-outer join. With
  per-source distributions P, Q (each summing to 1) the mixture-entropy
  decomposition collapses to shared terms only::

      JSD(P,Q) = ln 2 - T,
      T = sum over terms in BOTH of
          [ m*ln m - (p/2)*ln(p/2) - (q/2)*ln(q/2) ],  m = (p+q)/2

  (terms on one side only contribute exactly their half-entropy, which
  cancels against the ln-2 constant because sum(p) == 1). So the only
  pairwise work is an EQUI-join of the vocabulary-sized distribution
  frame with itself on ``term`` — output-sensitive in shared vocabulary,
  no per-pair scan of the corpus, no outer join. A term shared by S
  sources yields S*(S-1)/2 rows; S (number of sources) is the small
  dimension throughout.
- One tokenizing scan of the text column (fanned out, explode_outer per
  the plan-hygiene rule); the persisted (source, term, tf) frame feeds
  totals and the join, so the corpus is read once.
- ``mutual_information`` is one ``groupBy(x, y)`` count shuffle; the
  persisted cell frame (|X|*|Y| rows) feeds marginals and the MI sum.
  No Python anywhere in either operator.
"""

from __future__ import annotations

from math import log

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def source_unigram_dist(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """The shared per-group unigram distribution frame
    ``(group, term, p)`` with ``sum(p) == 1`` per group — one
    tokenizing scan, vocabulary x groups rows."""
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import tokenize

    toks = tokenize(
        fan_out_narrow_scans(df.select(group_col, text_col)), text_col
    )
    # persist the vocabulary-sized tf frame: totals AND the
    # distribution both derive from it, so the corpus is scanned once
    tf = (
        toks.groupBy(group_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
    )
    tot = tf.groupBy(group_col).agg(F.sum("tf").cast("double").alias("_tot"))
    # per-group totals are a groups-sized frame — broadcast is safe
    return tf.join(F.broadcast(tot), group_col).select(
        group_col, "term", (F.col("tf") / F.col("_tot")).alias("p")
    )


def jsd_sources(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    term distributions of every pair of groups (``a < b``
    lexicographically).

    Returns ``(source_a, source_b, n_shared_terms, jsd)`` with jsd
    rounded to 6 dp (house +1e-9 nudge). Groups with no shared terms
    report ``jsd = ln 2`` exactly (maximal divergence) and appear only
    if both groups exist in the corpus — the pair list is derived from
    the distribution frame, so token-less groups are absent.
    """
    dist = source_unigram_dist(df, group_col, text_col=text_col).persist()
    a = dist.select(
        F.col(group_col).alias("source_a"),
        "term",
        F.col("p").alias("_pa"),
    )
    b = dist.select(
        F.col(group_col).alias("source_b"),
        "term",
        F.col("p").alias("_pb"),
    )
    m = (F.col("_pa") + F.col("_pb")) / 2.0
    half = lambda c: (c / 2.0) * F.log(c / 2.0)  # noqa: E731
    shared = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(
                m * F.log(m) - half(F.col("_pa")) - half(F.col("_pb"))
            ).alias("_t"),
        )
    )
    # all pairs of observed groups — the groups frame is tiny; pairs
    # with zero shared vocabulary keep T = 0 (JSD = ln 2)
    groups = dist.select(group_col).distinct()
    ga = groups.select(F.col(group_col).alias("source_a"))
    gb = groups.select(F.col(group_col).alias("source_b"))
    pairs = ga.crossJoin(gb).where(F.col("source_a") < F.col("source_b"))
    out = pairs.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("n_shared_terms"), F.lit(0)).alias(
            "n_shared_terms"
        ),
        F.round(
            F.lit(log(2.0)) - F.coalesce(F.col("_t"), F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("jsd"),
    )
    return out


def source_transition_dist(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """The shared per-group bigram TRANSITION frame
    ``(group, prev, cur, q, pm)`` with ``q = P(cur | prev)`` (each
    conditional sums to 1 per (group, prev)) and ``pm = P(prev)`` the
    group's context marginal (sums to 1 per group). One tokenizing
    scan; bigrams built inside the words array (transform over a
    materialized words column, no positional self-join — the
    ``lm.bigram_nll`` extraction); the persisted (group, prev, cur,
    bf) frame feeds the context totals, group totals, and output."""
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans
    from htm_streamer_spark.operators.ranking import TOKEN_SPLIT

    g = group_col
    base = fan_out_narrow_scans(df.select(g, text_col))
    words = base.select(
        g,
        F.split(F.trim(F.lower(F.col(text_col))), TOKEN_SPLIT).alias("_w"),
    )
    pairs = words.select(
        g,
        F.expr(
            "transform(slice(_w, 1, greatest(size(_w) - 1, 0)),"
            " (w, i) -> struct(w AS prev, _w[i + 1] AS cur))"
        ).alias("_bg"),
    )
    bg = (
        pairs.select(g, F.explode_outer("_bg").alias("_p"))
        .select(
            g, F.col("_p.prev").alias("prev"), F.col("_p.cur").alias("cur")
        )
        .where(
            F.col("prev").isNotNull()
            & (F.col("prev") != "")
            & F.col("cur").isNotNull()
            & (F.col("cur") != "")
        )
    )
    bf = (
        bg.groupBy(g, "prev", "cur")
        .agg(F.count(F.lit(1)).alias("_bf"))
        .persist()
    )
    cf = bf.groupBy(g, "prev").agg(
        F.sum("_bf").cast("double").alias("_cf")
    )
    tot = bf.groupBy(g).agg(F.sum("_bf").cast("double").alias("_tot"))
    return (
        bf.join(cf, [g, "prev"])
        .join(F.broadcast(tot), g)
        .select(
            g,
            "prev",
            "cur",
            (F.col("_bf") / F.col("_cf")).alias("q"),
            (F.col("_cf") / F.col("_tot")).alias("pm"),
        )
    )


def transition_jsd_sources(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise bigram-TRANSITION Jensen-Shannon divergence between
    groups: the mixture-marginal-weighted mean of the per-context JSD
    between the groups' conditional next-token distributions,

        D(a, b) = sum_prev w(prev) · JSD( P_a(·|prev), P_b(·|prev) ),
        w(prev) = (pm_a(prev) + pm_b(prev)) / 2,

    with a context present in only ONE group contributing the maximal
    ln 2 (its transition behaviour is unobservable in the other). This
    is the ORDER-sensitive companion to ``jsd_sources``: two sources
    with identical vocabularies (unigram JSD ≈ 0) but different word
    order — template-stitched vs natural text — diverge here and only
    here. Bounded [0, ln 2]; 0 iff every shared context transitions
    identically and the context marginals coincide.

    The same shared-support collapse as ``jsd_sources`` applies
    per-context (each conditional sums to 1), and the one-sided terms
    telescope against the weight normalization, leaving::

        D = ln 2 − Σ over (prev, cur) shared of
              w(prev) · [ m·ln m − (qa/2)·ln(qa/2) − (qb/2)·ln(qb/2) ],
        m = (qa + qb) / 2

    — so the only pairwise work is an EQUI-join of the transition
    frame with itself on (prev, cur): output-sensitive in shared
    bigrams, no outer join, no per-pair corpus scan. Returns
    (source_a, source_b, n_shared_bigrams, tjsd), 6 dp.
    """
    dist = source_transition_dist(
        df, group_col, text_col=text_col
    ).persist()
    a = dist.select(
        F.col(group_col).alias("source_a"),
        "prev",
        "cur",
        F.col("q").alias("_qa"),
        F.col("pm").alias("_pa"),
    )
    b = dist.select(
        F.col(group_col).alias("source_b"),
        "prev",
        "cur",
        F.col("q").alias("_qb"),
        F.col("pm").alias("_pb"),
    )
    m = (F.col("_qa") + F.col("_qb")) / 2.0
    w = (F.col("_pa") + F.col("_pb")) / 2.0
    half = lambda c: (c / 2.0) * F.log(c / 2.0)  # noqa: E731
    shared = (
        a.join(b, ["prev", "cur"])
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_bigrams"),
            F.sum(
                w * (m * F.log(m) - half(F.col("_qa")) - half(F.col("_qb")))
            ).alias("_t"),
        )
    )
    groups = dist.select(group_col).distinct()
    ga = groups.select(F.col(group_col).alias("source_a"))
    gb = groups.select(F.col(group_col).alias("source_b"))
    pairs = ga.crossJoin(gb).where(F.col("source_a") < F.col("source_b"))
    return pairs.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("n_shared_bigrams"), F.lit(0)).alias(
            "n_shared_bigrams"
        ),
        F.round(
            F.lit(log(2.0)) - F.coalesce(F.col("_t"), F.lit(0.0))
            + F.lit(1e-9),
            6,
        ).alias("tjsd"),
    )


def basket_lift(
    df: DataFrame,
    basket_cols: list[str],
    item_col: str,
) -> DataFrame:
    """Pairwise co-occurrence lift of item values within baskets —
    market-basket association over a fact table: a basket is the
    distinct combination of ``basket_cols`` (e.g. ``[user_id, day]``),
    an item is a value of ``item_col`` (e.g. event_type), and

    ``lift(a, b) = P(a, b) / (P(a) * P(b))``

    over basket membership (lift == exp(PMI): > 1 co-occurring, < 1
    repelling, == 1 independent — the basket-level counterpart of
    ``mutual_information``, which averages this coupling over ALL
    cells; lift exposes the per-pair structure). Pairs that never
    co-occur are absent (their lift is 0; emitting the cross product
    of all item pairs would be |items|^2 rows of zeros).

    Plan: one scan collapses the fact table to the distinct
    (basket, item) membership frame (persisted — basket count, item
    frequencies, and the pair join all derive from it); the pair
    frame is a self-equi-join ON THE BASKET KEY, so a basket with m
    items yields m*(m-1)/2 rows — bounded by |items| per basket, never
    a cross join of the corpus. Returns
    (item_a, item_b, n_a, n_b, n_ab, support, lift), 6 dp.
    """
    membership = (
        df.select(*basket_cols, F.col(item_col).alias("_it"))
        .where(F.col("_it").isNotNull())
        .distinct()
        .persist()
    )
    tot = (
        membership.select(*basket_cols)
        .distinct()
        .agg(F.count(F.lit(1)).cast("double").alias("_nb"))
        .withColumn("_j", F.lit(1))
    )
    freq = membership.groupBy("_it").agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    a = membership.select(*basket_cols, F.col("_it").alias("item_a"))
    b = membership.select(*basket_cols, F.col("_it").alias("item_b"))
    pairs = (
        a.join(b, basket_cols)
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
    )
    fa = freq.select(F.col("_it").alias("item_a"), F.col("_n").alias("n_a"))
    fb = freq.select(F.col("_it").alias("item_b"), F.col("_n").alias("n_b"))
    # item-frequency frames are items-sized — broadcast both
    out = (
        pairs.join(F.broadcast(fa), "item_a")
        .join(F.broadcast(fb), "item_b")
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(tot), "_j")
        .select(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            F.round(F.col("n_ab") / F.col("_nb") + F.lit(1e-9), 6).alias(
                "support"
            ),
            F.round(
                (F.col("n_ab") * F.col("_nb"))
                / (F.col("n_a") * F.col("n_b"))
                + F.lit(1e-9),
                6,
            ).alias("lift"),
        )
    )
    return out


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns, with
    marginal entropies and the sqrt-normalized variant.

    ``MI = sum_xy p_xy * ln(p_xy / (p_x * p_y))`` over observed cells
    (absent cells have p_xy = 0 and contribute 0 in the limit);
    ``nmi = MI / sqrt(H(X) * H(Y))`` (NULL when either marginal
    entropy is 0 — a constant column carries no information to
    normalize by). Null category values count as their own level only
    if present in the data; rows where either column is NULL are
    excluded (MI over observed complete pairs).

    One ``groupBy(x, y)`` shuffle; marginals and totals derive from the
    persisted cell frame (|X|*|Y| rows), so the fact table is scanned
    once. Returns one row:
    ``(n_rows, n_cells, h_x, h_y, mi, nmi)``, 6 dp.
    """
    cells = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(
            F.col(x_col).alias("_x"), F.col(y_col).alias("_y")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .persist()
    )
    tot = cells.agg(F.sum("_c").alias("_n")).withColumn("_j", F.lit(1))
    mx = cells.groupBy("_x").agg(F.sum("_c").alias("_cx"))
    my = cells.groupBy("_y").agg(F.sum("_c").alias("_cy"))
    joined = (
        cells.join(mx, "_x")
        .join(my, "_y")
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(tot), "_j")
    )
    p_xy = F.col("_c") / F.col("_n")
    p_x = F.col("_cx") / F.col("_n")
    p_y = F.col("_cy") / F.col("_n")
    per_cell = joined.select(
        "_n",
        (p_xy * F.log(p_xy / (p_x * p_y))).alias("_mi"),
        # entropy contributions weighted so the plain sums below give
        # H(X) and H(Y) exactly: each (x,y) cell carries its share
        # p_xy/p_x of x's marginal term
        (-(p_xy) * F.log(p_x)).alias("_hx"),
        (-(p_xy) * F.log(p_y)).alias("_hy"),
    )
    agg = per_cell.groupBy().agg(
        F.coalesce(F.first("_n"), F.lit(0.0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.sum("_hx").alias("_shx"),
        F.sum("_hy").alias("_shy"),
        F.sum("_mi").alias("_smi"),
    )
    nmi = F.when(
        (F.col("_shx") > 0) & (F.col("_shy") > 0),
        F.col("_smi") / F.sqrt(F.col("_shx") * F.col("_shy")),
    )
    return agg.select(
        "n_rows",
        "n_cells",
        F.round(F.col("_shx") + F.lit(1e-9), 6).alias("h_x"),
        F.round(F.col("_shy") + F.lit(1e-9), 6).alias("h_y"),
        F.round(F.col("_smi") + F.lit(1e-9), 6).alias("mi"),
        F.round(nmi + F.lit(1e-9), 6).alias("nmi"),
    )


def hellinger_sources(
    df: DataFrame,
    group_col: str = "source",
    *,
    text_col: str = "text",
) -> DataFrame:
    """Pairwise Hellinger distance and Bhattacharyya coefficient
    between the unigram term distributions of every pair of groups
    (``a < b`` lexicographically) — the metric (triangle-inequality)
    member of the divergence battery::

        BC(P,Q)  = sum_t sqrt(p_t * q_t)          (0..1)
        H(P,Q)   = sqrt(1 - BC)                   (0..1, a true metric)
        D_B(P,Q) = -ln BC                         (NULL on disjoint support)

    vs the battery's other members: JSD (``jsd_sources``) is smooth
    but not a metric; PSI/KL (drift.py) are asymmetric baseline-vs-
    observed gates. Hellinger's metric property is what mixture-
    curation needs when distances feed clustering or triangle-pruned
    search over sources.

    Scale notes: terms on one side only contribute 0 to BC, so — like
    the JSD decomposition — the only pairwise work is an EQUI-join of
    the vocabulary-sized distribution frame with itself on ``term``;
    no per-pair outer join, one tokenizing scan. Output-sensitive in
    shared vocabulary; pairs of observed groups with zero shared terms
    report BC = 0, hellinger = 1, bhattacharyya NULL.

    Returns ``(source_a, source_b, n_shared_terms, bc, hellinger,
    bhattacharyya)``, 6 dp.
    """
    dist = source_unigram_dist(df, group_col, text_col=text_col).persist()
    a = dist.select(
        F.col(group_col).alias("source_a"), "term", F.col("p").alias("_pa")
    )
    b = dist.select(
        F.col(group_col).alias("source_b"), "term", F.col("p").alias("_pb")
    )
    shared = (
        a.join(b, "term")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
            F.sum(F.sqrt(F.col("_pa") * F.col("_pb"))).alias("_bc"),
        )
    )
    groups = dist.select(group_col).distinct()
    ga = groups.select(F.col(group_col).alias("source_a"))
    gb = groups.select(F.col(group_col).alias("source_b"))
    pairs = ga.crossJoin(gb).where(F.col("source_a") < F.col("source_b"))
    bc = F.coalesce(F.col("_bc"), F.lit(0.0))
    # float sums can drift a hair past 1.0; clamp so sqrt stays real
    bc1 = F.least(bc, F.lit(1.0))
    return pairs.join(shared, ["source_a", "source_b"], "left").select(
        "source_a",
        "source_b",
        F.coalesce(F.col("n_shared_terms"), F.lit(0)).alias("n_shared_terms"),
        F.round(bc + F.lit(1e-9), 6).alias("bc"),
        F.round(F.sqrt(F.lit(1.0) - bc1) + F.lit(1e-9), 6).alias("hellinger"),
        F.when(bc > 0, F.round(-F.log(bc) + F.lit(1e-9), 6)).alias(
            "bhattacharyya"
        ),
    )


def cramers_v(
    df: DataFrame,
    x_col: str,
    y_col: str,
) -> DataFrame:
    """Pearson chi-square independence test + Cramér's V effect size
    between two categorical columns, with the Bergsma (2013)
    bias-corrected variant.

    ``chi2 = sum_cells (o - e)^2 / e`` with ``e = cx * cy / n`` over
    the FULL r x c grid — but expanding the square collapses the
    zero-observed cells: ``chi2 = sum_observed o^2/e - n`` (the
    ``-2*sum o + sum e`` terms are both exactly ``n``), so only the
    observed-cell frame is ever materialized.
    ``V = sqrt(chi2 / (n * (min(r,c) - 1)))`` — the 0..1 effect size
    MI lacks a ceiling for; ``v_corrected`` applies the Bergsma
    phi2/row/col shrinkage (NULL when the corrected denominator
    degenerates, e.g. 2x2 with tiny n). Rows where either column is
    NULL are excluded, matching ``mutual_information``.

    One ``groupBy(x, y)`` shuffle; marginals and totals derive from
    the persisted observed-cell frame, so the fact table is scanned
    once. Returns one row: ``(n_rows, n_x, n_y, dof, chi2, v,
    v_corrected)``, 6 dp.
    """
    cells = (
        df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
        .groupBy(F.col(x_col).alias("_x"), F.col(y_col).alias("_y"))
        .agg(F.count(F.lit(1)).cast("double").alias("_c"))
        .persist()
    )
    mx = cells.groupBy("_x").agg(F.sum("_c").alias("_cx"))
    my = cells.groupBy("_y").agg(F.sum("_c").alias("_cy"))
    tot = cells.agg(
        F.sum("_c").alias("_n"),
        F.count_distinct("_x").cast("double").alias("_r"),
        F.count_distinct("_y").cast("double").alias("_k"),
    ).withColumn("_j", F.lit(1))
    joined = (
        cells.join(mx, "_x")
        .join(my, "_y")
        .withColumn("_j", F.lit(1))
        .join(F.broadcast(tot), "_j")
    )
    agg = joined.groupBy().agg(
        F.first("_n").alias("_n"),
        F.first("_r").alias("_r"),
        F.first("_k").alias("_k"),
        F.sum(
            F.col("_c") * F.col("_c") / (F.col("_cx") * F.col("_cy") / F.col("_n"))
        ).alias("_s"),
    )
    chi2 = F.col("_s") - F.col("_n")
    minrc = F.least(F.col("_r"), F.col("_k"))
    v = F.when(
        minrc > 1, F.sqrt(F.greatest(chi2, F.lit(0.0)) / (F.col("_n") * (minrc - 1)))
    )
    # Bergsma bias correction
    phi2 = F.greatest(chi2, F.lit(0.0)) / F.col("_n")
    corr = (F.col("_r") - 1) * (F.col("_k") - 1) / (F.col("_n") - 1)
    phi2c = F.greatest(phi2 - corr, F.lit(0.0))
    rc = F.col("_r") - (F.col("_r") - 1) * (F.col("_r") - 1) / (F.col("_n") - 1)
    kc = F.col("_k") - (F.col("_k") - 1) * (F.col("_k") - 1) / (F.col("_n") - 1)
    minc = F.least(rc, kc) - 1
    vc = F.when((F.col("_n") > 1) & (minc > 0), F.sqrt(phi2c / minc))
    return agg.select(
        F.col("_n").cast("long").alias("n_rows"),
        F.col("_r").cast("long").alias("n_x"),
        F.col("_k").cast("long").alias("n_y"),
        ((F.col("_r") - 1) * (F.col("_k") - 1)).cast("long").alias("dof"),
        F.round(chi2 + F.lit(1e-9), 6).alias("chi2"),
        F.round(v + F.lit(1e-9), 6).alias("v"),
        F.round(vc + F.lit(1e-9), 6).alias("v_corrected"),
    )
