"""Quantile binning: exact quartiles vs a pandas qcut-style oracle,
approx-vs-exact agreement away from thresholds, bin population balance,
and determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.binning import (
    quantile_bins_approx,
    quantile_bins_exact,
)


@pytest.fixture(scope="module")
def docs(spark):
    # quality = deterministic pseudo-random per doc, two strata
    return spark.range(4_000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        ((F.col("id") * 2654435761) % 10_007).cast("double").alias("quality"),
    )


def test_exact_bins_match_rank_oracle(spark, docs):
    got = {r.doc_id: r.bin for r in quantile_bins_exact(docs, "quality").collect()}
    pdf = docs.toPandas()
    for lang, g in pdf.groupby("lang"):
        g = g.sort_values(["quality", "doc_id"]).reset_index(drop=True)
        n = len(g)
        for i, doc in enumerate(g["doc_id"]):
            pr = i / (n - 1)
            want = min(int(pr * 4), 3)
            assert got[doc] == want, (doc, got[doc], want)


def test_exact_bins_balanced(spark, docs):
    out = quantile_bins_exact(docs, "quality")
    counts = out.groupBy("lang", "bin").count().collect()
    for r in counts:
        assert r["count"] == pytest.approx(500, rel=0.02), r


def test_approx_agrees_away_from_thresholds(spark, docs):
    exact = {r.doc_id: r.bin for r in quantile_bins_exact(docs, "quality").collect()}
    approx = {
        r.doc_id: r.bin
        for r in quantile_bins_approx(docs, "quality", rel_err=0.001).collect()
    }
    assert set(exact) == set(approx)
    agree = sum(1 for k in exact if exact[k] == approx[k])
    assert agree / len(exact) >= 0.98, agree / len(exact)
    # disagreement is never more than one bin (only threshold-band rows)
    assert all(abs(exact[k] - approx[k]) <= 1 for k in exact)


def test_approx_single_agg_plan(spark, docs):
    """The approx tier must not run one job per stratum: its plan is a
    grouped sketch agg + broadcast join — assert one broadcast and no
    more than the agg's own exchanges."""
    import io
    import re
    from contextlib import redirect_stdout

    out = quantile_bins_approx(docs, "quality")
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert len(re.findall(r"^\(\d+\) BroadcastExchange\b", plan, re.M)) == 1
