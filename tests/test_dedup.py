"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from htm_streamer_spark.operators.dedup import (
    exact_duplicates,
    minhash_near_duplicates,
    minhash_signatures,
    shingles,
    simhash_candidate_pairs,
    simhash_fingerprints,
)

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away into "
    "the deep green forest where tall trees grow beside the cold river"
)


@pytest.fixture(scope="module")
def docs(spark):
    near = BASE.replace("cold river", "cold stream")  # 2-word change
    rows = [
        (1, BASE),
        (2, BASE),                               # exact dup of 1
        (3, "The quick brown fox! " + BASE[20:]),  # near-exact (case/punct)
        (4, near),                               # near dup of 1
        (5, "completely different text about spark dataframes and shuffles "
            "with partitions and executors running tasks in parallel stages"),
        (6, "short"),
        (7, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = exact_duplicates(docs).collect()
    assert len(got) == 1
    assert got[0]["n_copies"] == 3  # 1, 2 and 3 normalize identically
    assert got[0]["sample_doc_ids"] == [1, 2, 3]


def test_exact_duplicates_sample_is_bounded_and_deterministic(spark):
    """Hot digest: the member array is capped at sample_ids (never the
    full 10^5-style member list) and the sample is the lexically
    smallest ids regardless of partitioning."""
    n = 5000
    rows = [(i, "the same boilerplate text") for i in range(n)] + [
        (n, "a unique document about something else entirely")
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    got = exact_duplicates(df, sample_ids=8).collect()
    assert len(got) == 1
    assert got[0]["n_copies"] == n
    assert got[0]["sample_doc_ids"] == list(range(8))


def test_exact_duplicates_million_copy_digest(spark):
    """VERDICT r2 item 5: a 10^6-copy hot digest. The salted two-phase
    plan must produce the exact count and the 8 smallest doc_ids while
    never materializing an intermediate array beyond sample_ids (the
    row_number pre-filter bounds each shard's collect_list)."""
    n = 1_000_000
    hot = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit("the same boilerplate text").alias("text")
    )
    uniq = spark.range(n, n + 10).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id")).alias("text"),
    )
    df = hot.unionByName(uniq).withColumn("doc_id", F.col("doc_id").cast("string"))
    got = exact_duplicates(df, sample_ids=8).collect()
    assert len(got) == 1
    assert got[0]["n_copies"] == n
    # lexically smallest string doc_ids of 0..999999
    want = sorted((str(i) for i in range(n)))[:8]
    assert got[0]["sample_doc_ids"] == want


def test_shingles_deterministic(docs):
    sh = shingles(docs).filter(F.col("doc_id") == 1)
    n_words = len(BASE.split())
    assert sh.count() == n_words - 2  # one shingle per 3-gram position


def test_minhash_near_duplicates(docs):
    pairs = minhash_near_duplicates(docs, jaccard_threshold=0.5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    # the exact dups and the near dup must surface; doc 5 must not pair
    assert (1, 2) in found
    assert (1, 4) in found or (2, 4) in found or (3, 4) in found
    assert not any(5 in p for p in found)
    for r in pairs:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_simhash_similar_docs_close(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    assert fp[1] == fp[2]  # identical text -> identical simhash
    ham_near = bin((fp[1] ^ fp[4]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((fp[1] ^ fp[5]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far


def test_simhash_candidates(spark, docs):
    fps = simhash_fingerprints(docs)
    pairs = {(r["doc_a"], r["doc_b"]) for r in simhash_candidate_pairs(fps).collect()}
    assert (1, 2) in pairs


def test_minhash_signature_width(docs):
    sigs = minhash_signatures(shingles(docs), num_hashes=32)
    row = sigs.filter(F.col("doc_id") == 1).collect()[0]
    assert len(row["sig"]) == 32


def test_simhash_plan_single_arrow_stage_no_python_udf(docs):
    """The only Python in the simhash plan is ONE mapInArrow vote kernel
    — word hashing stays JVM-side (no per-row Python, per input_hint)."""
    df = simhash_fingerprints(docs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert plan.count("MapInArrow") == 1, plan


def test_simhash_xxhash_method_same_shape(docs):
    """The production (xxhash64) hash path produces valid 60-bit sigs
    with the same grouping behavior: identical docs collide."""
    fp = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs, method="xxhash64").collect()}
    assert fp[1] == fp[2]
    assert all(0 <= v < (1 << 60) for v in fp.values())


def test_lsh_mega_bucket_dropped_before_collect(spark):
    """Boilerplate guard: a bucket holding thousands of identical docs
    must be excluded by the count-first pass (never collected), while
    small legitimate buckets still pair."""
    boiler = "identical boilerplate text repeated across the corpus " * 8
    rows = [(i, boiler) for i in range(2000)]
    rows += [(9001, BASE), (9002, BASE)]  # one small legit dup bucket
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    pairs = minhash_near_duplicates(df, jaccard_threshold=0.9).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (9001, 9002) in found
    assert not any(a < 9000 and b < 9000 for a, b in found)  # mega-bucket dropped


def test_fan_out_narrow_scans_guard(spark):
    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    slots = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert fan_out_narrow_scans(narrow).rdd.getNumPartitions() == slots
    wide = spark.range(1000).repartition(slots + 4)
    # already at/above parallelism: must be a NO-OP (no extra shuffle)
    assert fan_out_narrow_scans(wide) is wide


class TestPlanLshBands:
    """plan_lsh_bands: S-curve knee selection (pure math, no Spark)."""

    def test_default_recipe_is_preserved(self):
        from htm_streamer_spark.operators.dedup import plan_lsh_bands

        # the repo's long-standing hand-tuned split falls out of the math
        assert plan_lsh_bands(0.8, 32) == (8, 4)

    def test_knee_tracks_threshold_from_below_when_possible(self):
        from htm_streamer_spark.operators.dedup import plan_lsh_bands

        for thr in (0.5, 0.6, 0.7, 0.8, 0.9):
            b, r = plan_lsh_bands(thr, 64)
            assert b * r == 64 and r >= 2
            knee = (1.0 / b) ** (1.0 / r)
            # below the target unless no divisor split sits below it
            assert knee <= thr + 1e-9 or all(
                (1.0 / bb) ** (1.0 / (64 // bb)) > thr
                for bb in range(1, 65)
                if 64 % bb == 0 and 64 // bb >= 2
            )
            # collision probability at the threshold is high (recall side)
            p_at_thr = 1.0 - (1.0 - thr**r) ** b
            assert p_at_thr > 0.5

    def test_low_threshold_gets_more_bands(self):
        from htm_streamer_spark.operators.dedup import plan_lsh_bands

        b_low, _ = plan_lsh_bands(0.4, 32)
        b_high, _ = plan_lsh_bands(0.9, 32)
        assert b_low > b_high

    def test_guards(self):
        from htm_streamer_spark.operators.dedup import plan_lsh_bands

        import pytest as _pytest
        with _pytest.raises(ValueError):
            plan_lsh_bands(0.0, 32)
        with _pytest.raises(ValueError):
            plan_lsh_bands(1.0, 32)
        with _pytest.raises(ValueError):
            plan_lsh_bands(0.5, 1)
