"""Deterministic split/sampling: proportions, stability under
partitioning and rebuilds, disjointness/coverage, stratum fractions,
and the no-shuffle plan claim."""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.sampling import hash_split, stratified_sample

WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(20_000).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
    )


def test_split_proportions_and_total(spark, docs):
    out = hash_split(docs, WEIGHTS)
    counts = {r.split: r.cnt for r in out.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    assert sum(counts.values()) == 20_000
    for name, w in WEIGHTS.items():
        assert counts[name] == pytest.approx(20_000 * w, rel=0.06), counts


def test_split_stable_under_partitioning_and_rebuild(spark, docs):
    a = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS).collect()}
    b = {r.doc_id: r.split for r in hash_split(docs.repartition(17), WEIGHTS).collect()}
    assert a == b
    # a rebuilt corpus (subset) keeps every surviving doc's assignment
    sub = docs.filter(F.col("doc_id").contains("7"))
    c = {r.doc_id: r.split for r in hash_split(sub, WEIGHTS).collect()}
    assert all(a[k] == v for k, v in c.items())


def test_different_salt_draws_independent_split(spark, docs):
    a = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS, salt="s1").collect()}
    b = {r.doc_id: r.split for r in hash_split(docs, WEIGHTS, salt="s2").collect()}
    moved = sum(1 for k in a if a[k] != b[k])
    assert moved > 2_000  # a re-salt reshuffles a large fraction


def test_stratified_fractions_per_stratum(spark, docs):
    out = stratified_sample(docs, {"en": 0.5, "de": 0.1})
    got = {r.lang: r.cnt for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    n = 20_000 // 3
    assert got.get("en", 0) == pytest.approx(n * 0.5, rel=0.1)
    assert got.get("de", 0) == pytest.approx(n * 0.1, rel=0.2)
    assert "fr" not in got  # default fraction 0


def test_sampling_is_subset_and_stable(spark, docs):
    out1 = {r.doc_id for r in stratified_sample(docs, {"en": 0.3}).collect()}
    out2 = {r.doc_id for r in stratified_sample(docs.repartition(9), {"en": 0.3}).collect()}
    assert out1 == out2
    # raising a fraction only ADDS members (incremental-rebuild property)
    bigger = {r.doc_id for r in stratified_sample(docs, {"en": 0.6}).collect()}
    assert out1 < bigger


def test_no_shuffle_in_plan(spark, docs):
    out = stratified_sample(hash_split(docs, WEIGHTS), {"en": 0.5})
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert not re.search(r"^\(\d+\) Exchange\b", buf.getvalue(), re.M)


def test_global_shuffle_positions_dense_and_stable(spark):
    from htm_streamer_spark.operators.sampling import global_shuffle_positions

    docs = spark.range(1000).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r.shuffle_pos for r in global_shuffle_positions(docs).collect()}
    assert sorted(out.values()) == list(range(1000))  # dense 0..N-1
    # partitioning-independent total order
    out2 = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle_positions(docs.repartition(13)).collect()
    }
    assert out == out2
    # a different salt is a different permutation of the same positions
    out3 = {
        r.doc_id: r.shuffle_pos
        for r in global_shuffle_positions(docs, salt="shuffle-v2").collect()
    }
    assert sorted(out3.values()) == list(range(1000))
    assert out3 != out


def test_global_shuffle_matches_naive_global_window(spark):
    from htm_streamer_spark.operators.sampling import (
        global_shuffle_positions,
        hash_bucket,
    )
    from pyspark.sql import Window

    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    h = hash_bucket(F.col("doc_id"), "shuffle-v1")
    naive = docs.select(
        "doc_id",
        (
            F.row_number().over(
                Window.orderBy(
                    F.pmod(h, F.lit(256)), h, F.col("doc_id")
                )
            )
            - 1
        ).cast("long").alias("shuffle_pos"),
    )
    got = {r.doc_id: r.shuffle_pos for r in global_shuffle_positions(docs).collect()}
    want = {r.doc_id: r.shuffle_pos for r in naive.collect()}
    assert got == want


def test_global_shuffle_no_single_partition_data_window(spark):
    from htm_streamer_spark.operators.sampling import global_shuffle_positions

    docs = spark.range(1000).select(F.col("id").alias("doc_id")).repartition(8)
    plan = (
        global_shuffle_positions(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the data-carrying window is hash-partitioned by bucket; the only
    # SinglePartition exchange feeds the n_buckets-row offsets frame
    assert "hashpartitioning(__b" in plan, plan


def test_weighted_sample_matches_python_reference(spark):
    """Selection must equal the sequential PPS reference computed in
    plain python over the same hash order."""
    import hashlib

    from htm_streamer_spark.operators.sampling import weighted_systematic_sample

    rows = [(i, (i * 37) % 11 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    k = 17

    def h(i):
        return int(hashlib.md5(f"{i}:wsample-v1".encode()).hexdigest()[:8], 16) % 1_000_000

    ordered = sorted(rows, key=lambda r: (h(r[0]) % 256, h(r[0]), r[0]))
    W = sum(w for _, w in ordered)
    expect, s = set(), 0
    for i, w in ordered:
        if -(-(s + w) * k // W) > -(-s * k // W):  # ceil((s+w)k/W) > ceil(sk/W)
            expect.add(i)
        s += w
    got = {r.doc_id for r in weighted_systematic_sample(df, k=k, weight_col="n_chars").collect()}
    assert got == expect
    assert len(got) <= k


def test_weighted_sample_certainty_and_counts(spark):
    from htm_streamer_spark.operators.sampling import weighted_systematic_sample

    # one row owns >W/k of the mass -> always selected (certainty item)
    rows = [(0, 10_000)] + [(i, 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r.doc_id for r in weighted_systematic_sample(df, k=10, weight_col="n_chars").collect()}
    assert 0 in got
    # k >= W selects every positive-weight row exactly once
    small = spark.createDataFrame([(i, 1) for i in range(5)], "doc_id long, n_chars long")
    out = weighted_systematic_sample(small, k=100, weight_col="n_chars").collect()
    assert sorted(r.doc_id for r in out) == [0, 1, 2, 3, 4]


def test_weighted_sample_partitioning_invariant_and_guards(spark):
    import pytest as _pytest

    from htm_streamer_spark.operators.sampling import weighted_systematic_sample

    rows = [(i, (i % 5) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    a = {r.doc_id for r in weighted_systematic_sample(df, k=20, weight_col="n_chars").collect()}
    b = {r.doc_id for r in weighted_systematic_sample(df.repartition(13), k=20, weight_col="n_chars").collect()}
    assert a == b
    # zero/negative weights excluded, never crash
    wz = spark.createDataFrame([(1, 0), (2, -5), (3, 4)], "doc_id long, n_chars long")
    assert {r.doc_id for r in weighted_systematic_sample(wz, k=2, weight_col="n_chars").collect()} == {3}
    with _pytest.raises(ValueError):
        weighted_systematic_sample(df, k=0, weight_col="n_chars")


def test_leakage_safe_split_cluster_atomicity(spark):
    """Every member of a near-dup component lands on the same side;
    singleton docs split exactly as a plain hash_split of their own id
    (cluster_id == doc_id for them)."""
    from htm_streamer_spark.operators.sampling import hash_split, leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    # chain 0-1-2, pair (10,11), pair (10,12) → component {10,11,12}
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11), (10, 12)], "doc_a long, doc_b long"
    )
    out = leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(by_id) == 300
    for comp in ([0, 1, 2], [10, 11, 12]):
        sides = {by_id[i].split for i in comp}
        clusters = {by_id[i].cluster_id for i in comp}
        assert len(sides) == 1 and clusters == {min(comp)}
    # singletons: identical assignment to plain hash_split on doc_id
    plain = {
        r.doc_id: r.split
        for r in hash_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1}
        ).collect()
    }
    for i in range(13, 300):
        assert by_id[i].split == plain[i]
    # weights roughly honored over 300 clusters
    n_train = sum(1 for r in out if r.split == "train")
    assert 0.7 * 300 < n_train < 0.9 * 300


def test_winsorize_exact_matches_numpy(spark):
    """Exact tier == numpy clip at interpolated quantiles; nulls pass
    through; approx tier lands within the sketch tolerance."""
    import numpy as np

    from htm_streamer_spark.operators.stats import winsorize

    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.normal(100, 10, 500), [10_000.0, -10_000.0]])
    rows = [(int(i), float(v)) for i, v in enumerate(vals)] + [(9999, None)]
    df = spark.createDataFrame(rows, "id long, v double")

    got = {r.id: r.v_w for r in winsorize(df, "v", lo=0.05, hi=0.95, exact=True).collect()}
    q_lo, q_hi = np.quantile(vals, [0.05, 0.95])  # linear interpolation
    want = np.clip(vals, q_lo, q_hi)
    for i, w in enumerate(want):
        assert abs(got[i] - w) < 1e-9
    assert got[9999] is None  # null passes through

    approx = {
        r.id: r.v_w for r in winsorize(df, "v", lo=0.05, hi=0.95).collect()
    }
    # sketch bounds land on real data values near the exact quantile;
    # every clipped value stays within the data's central range
    assert max(approx[i] for i in range(len(vals))) <= np.quantile(vals, 0.97)
    assert min(approx[i] for i in range(len(vals))) >= np.quantile(vals, 0.03)


def test_winsorize_grouped_bounds_are_per_group(spark):
    from htm_streamer_spark.operators.stats import winsorize

    rows = [("a", float(v)) for v in range(101)] + [("b", float(v * 100)) for v in range(101)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", group_col="g", lo=0.0, hi=0.9, exact=True)
    mx = {r.g: r.mx for r in out.groupBy("g").agg(F.max("v_w").alias("mx")).collect()}
    assert mx == {"a": 90.0, "b": 9000.0}
