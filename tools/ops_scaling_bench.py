"""Scaling evidence for the operator families beyond the flagship
(same N vs 4N protocol as tools/scaling_bench.py, SURVEY.md §4.3).

The sf0.1 documents table is only 5,000 rows — too small to exercise
parallelism in the text pipelines — so this harness synthesizes a
deterministic 20x replication (100,000 docs: doc_id offset + a per-copy
token suffix so near-dup structure is preserved but ids stay unique)
into ``.data/docs20x`` and times three representative operators at two
parallelism levels, each in its own JVM subprocess, best-of-``repeats``:

- minhash_pairs  (dedup family: shingle -> minhash -> LSH -> confirm)
- tfidf          (ranking family: tokenize -> tf -> df -> window top-k)
- global_shuffle (order-index family: bucket counts -> offsets -> rank)
- unigram_nll    (LM family: tokenize -> corpus counts -> model join -> agg)
- spearman       (rank-stats family: per-group sort windows + power sums)

Usage: python tools/ops_scaling_bench.py [repeats] [lo] [hi] [out.json]
Writes BENCH/ops_scaling.json (or the given filename under BENCH/).
SPARK_GRAFT_FAMILIES=a,b restricts to a family subset (used to bench
newly added families in their own session file without re-running the
full battery).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DOCS = REPO / ".data" / "docs20x"
DOCS_BIG = REPO / ".data" / "docs100x"
EMB_BIG = REPO / ".data" / "emb500x"
EMB_XL = REPO / ".data" / "emb8m"

_WORKER = """
import os, sys, time
# pin BLAS to one thread per python worker: a multi-threaded matmul
# inside one Spark task would launder hardware parallelism into the
# low-cores level and corrupt the N->4N ratio (tasks get 1 core each
# on a real cluster)
for _v in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ[_v] = "1"
sys.path.insert(0, {repo!r})
from htm_streamer_spark import get_spark
from pyspark.sql import functions as F

cores = int(sys.argv[1])
repeats = int(sys.argv[2])
spark = get_spark(cores=cores, driver_memory="8g")
d = spark.read.parquet({docs!r})
d.count()  # warm scan + JVM
big = spark.read.parquet({docs_big!r})
big.count()

def run(name):
    if name == "minhash_pairs":
        from htm_streamer_spark.operators.dedup import minhash_near_duplicates
        df = minhash_near_duplicates(d, jaccard_threshold=0.5)
    elif name == "tfidf":
        from htm_streamer_spark.operators.ranking import tfidf_top_terms
        df = tfidf_top_terms(d, k=3)
    elif name == "global_shuffle":
        from htm_streamer_spark.operators.sampling import global_shuffle_positions
        df = global_shuffle_positions(d)
    elif name == "unigram_nll":
        # 500k-doc corpus: at 100k docs the whole job is ~1.7s and
        # fixed per-job overhead dominates the ratio (cf global_shuffle)
        from htm_streamer_spark.operators.lm import unigram_nll
        df = unigram_nll(big)
    elif name == "chunk":
        # zero-shuffle codegen family: tokenize-once + explode + slice;
        # 500k docs so per-job overhead doesn't dominate
        from htm_streamer_spark.operators.chunking import chunk_tokens
        df = chunk_tokens(big, chunk_size=64, stride=48)
    elif name == "dup_spans":
        # shuffle-heavy gram family: explode 5-grams -> doc frequency
        # -> join back -> per-doc rollup
        from htm_streamer_spark.operators.repetition import cross_doc_dup_spans
        df = cross_doc_dup_spans(d, n=5, min_docs=2)
    elif name == "spearman":
        # rank-statistics family: two per-group sort windows over the
        # 500k-row frame (20 source groups) + power-sum agg — the
        # sort-dominated shape of the stattests/rankstats battery
        from htm_streamer_spark.operators.rankstats import spearman_corr
        df = spearman_corr(big, "source", "doc_id", "n_chars")
    elif name == "table_digest":
        # scan-bound md5 family: canonical render + hash per row, one
        # map-side-combinable agg — the shape that should track the
        # pure-CPU ceiling most closely (no shuffle beyond 1 row/group).
        # 500k rows hash in <1s (fixed per-job overhead dominates, cf
        # global_shuffle) so the probe inflates to 4M rows via a
        # crossJoin replication — compute-dominated at every level
        from htm_streamer_spark.operators.checksum import table_digest
        wide8 = big.crossJoin(
            big.sparkSession.range(8).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") * 8 + F.col("rep")).alias("doc_id"),
            "source", "n_chars", "lang",
        )
        df = table_digest(wide8, ["doc_id", "source", "n_chars"], group_by="lang")
    elif name == "corr_matrix":
        # power-sum aggregation family: 6 pairwise correlations = 37
        # conditional sums in ONE agg, single reduce; inflated to 4M
        # rows for the same per-job-overhead reason as table_digest
        from htm_streamer_spark.operators.corrmatrix import correlation_matrix
        wide = big.crossJoin(
            big.sparkSession.range(8).select(F.col("id").alias("rep"))
        ).select(
            (F.col("n_chars") + F.col("rep")).alias("n_chars"),
            F.length("text").alias("text_len"),
            (F.col("doc_id") % 997).alias("id_mod"),
            ((F.col("n_chars") * (F.col("rep") + 1)) % 101).alias("chars_mod"),
        )
        df = correlation_matrix(wide, ["n_chars", "text_len", "id_mod", "chars_mod"])
    elif name == "embed_integrity":
        # vector-invariant family: codegen array folds (null / dim /
        # finite / L2 norm) + one counter-row shuffle — the scan-bound
        # gate every embedding pipeline runs first. 1M dim-64 vectors;
        # group derived from vec_id (the 500x replication drops label)
        from htm_streamer_spark.operators.veccheck import embedding_integrity
        emb = spark.read.parquet({emb_xl!r}).withColumn(
            "label", (F.col("vec_id") % 20).cast("string"))
        df = embedding_integrity(emb, "embedding", dim=64, group_by="label")
    elif name == "embed_dim_profile":
        # per-dimension drift-baseline family: 128 codegen agg
        # expressions (mean+var per dim), shuffle carries one
        # 128-counter row per (task, group), explode AFTER aggregation
        from htm_streamer_spark.operators.veccheck import embedding_dim_profile
        emb = spark.read.parquet({emb_xl!r}).withColumn(
            "label", (F.col("vec_id") % 20).cast("string"))
        df = embedding_dim_profile(emb, "embedding", dim=64, group_by="label")
    elif name == "semdedup":
        # embedding family: one Arrow matmul assignment pass + one
        # shuffle on cluster_id + per-cluster O(m^2) numpy pruning —
        # the compute lives in python workers (BLAS pinned to 1
        # thread), so this probes Arrow-stage scaling specifically.
        # 1M dim-64 vectors, 256 clusters => ~4k-row clusters; ~250
        # GFLOP of pinned-f32 blocked-prefix work (the kernel's rank-
        # ordered block pass) — minutes per run at the low level, so
        # per-job overhead and the serial training step are noise
        from htm_streamer_spark.operators.semdedup import semantic_dedup
        emb = spark.read.parquet({emb_big!r})
        df = semantic_dedup(emb, n_clusters=256, eps=0.95,
                            train_sample=20_000, max_cluster_rows=40_000)
    elif name == "heaps":
        # vocabulary-growth family: tokenize 500k docs -> ONE
        # (bucket, term) count shuffle (map-side partial) -> 32-row
        # cumsum + OLS; probes the token-aggregation plane with a
        # metadata-sized tail
        from htm_streamer_spark.operators.lm import heaps_fit
        df = heaps_fit(big, n_buckets=32)
    elif name == "source_overlap":
        # fingerprint-join family: winnowing (gram md5 + doubling
        # sliding-min, the dedup tier's CPU shape) -> distinct
        # (source, fp) collapse -> bounded fp self-join
        from htm_streamer_spark.operators.contamination import cross_source_overlap
        df = cross_source_overlap(d)
    elif name == "energy":
        # rank-coefficient union-sort family: three cumulative sums +
        # group totals over ONE per-group sort of a 32M-row frame (20
        # groups) — the O(N log N) two-sample shape; heavy inflation
        # because the 4M variant finished in 0.7s and per-job overhead
        # buried the parallelism signal (same trap as table_digest)
        from htm_streamer_spark.operators.stattests import energy_distance
        wide = big.crossJoin(
            big.sparkSession.range(64).select(F.col("id").alias("rep"))
        ).select(
            "source",
            (F.col("n_chars") + F.col("rep") * 7).alias("v"),
            (F.col("doc_id") % 2).alias("half"),
        )
        df = energy_distance(wide, "source", "v", "half", a_value=0)
    elif name == "isotonic":
        # bucket-minimax family: the fact work is ONE (group, x)
        # aggregate over 128M rows; the exact-PAVA minimax runs as joins
        # on the resulting 24-bucket frame — probes that the
        # shape-constrained fit stays aggregate-bound, never
        # sequential
        from htm_streamer_spark.operators.isotonic import isotonic_fit
        # 128M rows: the minimax tail is a fixed ~1s of metadata joins
        # at any level, so the probe must make the fact aggregate
        # dominate or the tail floors the N->4N ratio
        wide = big.crossJoin(
            big.sparkSession.range(256).select(F.col("id").alias("rep"))
        ).select(
            "lang",
            (F.col("n_chars") % 24).alias("x"),
            (F.col("n_chars") + F.col("rep") * 3).cast("double").alias("y"),
        )
        df = isotonic_fit(wide, "lang", "x", "y")
    elif name == "transition_jsd":
        # bigram-graph family: tokenize 500k docs -> in-array bigram
        # build -> (source, prev, cur) count shuffle -> conditional +
        # marginal joins -> pairwise equi-join on (prev, cur) over 20
        # sources — the order-sensitive corpus-comparison shape
        from htm_streamer_spark.operators.infotheory import transition_jsd_sources
        df = transition_jsd_sources(big, "source")
    elif name == "arrival_profile":
        # fused arrival-battery family: ONE (group, hour) count
        # aggregate over 32M synthetic event rows feeds dispersion +
        # Ljung-Box + periodogram + spectral entropy via the shared
        # persisted dense frame — probes that the fusion stays
        # aggregate-bound (the windows/joins run on the metadata-sized
        # bucket frame, invariant to the fact size)
        from htm_streamer_spark.operators.stattests import arrival_profile
        wide = big.crossJoin(
            big.sparkSession.range(64).select(F.col("id").alias("rep"))
        ).select(
            "lang",
            F.timestamp_seconds(
                F.lit(1700000000)
                + ((F.col("doc_id") * 37 + F.col("rep") * 911) % (720 * 3600))
            ).alias("ts"),
        )
        df = arrival_profile(wide, "lang", "ts", bucket="hour")
    elif name == "logrank":
        # survival family: per-(group, entity) lead window over 32M
        # rows (3.2M entities — wide task parallelism), then the
        # collapsed per-duration frame; probes the duration-derivation
        # window plane, the family's only fact-sized work
        from htm_streamer_spark.operators.survival import logrank_test
        wide = big.crossJoin(
            big.sparkSession.range(64).select(F.col("id").alias("rep"))
        ).select(
            "lang",
            F.col("doc_id").alias("entity"),
            F.timestamp_seconds(
                F.lit(1700000000)
                + ((F.col("doc_id") * 37 + F.col("rep") * 911
                    + F.col("n_chars")) % (720 * 3600))
            ).alias("ts"),
            (F.col("doc_id") % 2).alias("half"),
        )
        df = logrank_test(
            wide, "lang", "entity", "ts", "half", round_to=600
        )
    elif name == "kruskal":
        # k-sample rank family: pooled midranks = two windows over one
        # per-group sort of 128M rows across 64 synthetic shards (the
        # hot-group serial bound spread wide), then subset-key
        # clustered reductions; 256x inflation because the 32M variant
        # finished in ~1s and per-job overhead buried the signal
        from htm_streamer_spark.operators.rankstats import kruskal_wallis
        wide = big.crossJoin(
            big.sparkSession.range(256).select(F.col("id").alias("rep"))
        ).select(
            (F.col("doc_id") % 64).alias("shard"),
            "source",
            (F.col("n_chars") + F.col("rep") * 7).alias("v"),
        )
        df = kruskal_wallis(wide, "shard", "v", "source")
    elif name == "bloom_decontam":
        # bloom-gate family: tokenize 500k docs -> gram explode ->
        # map-side Arrow bit-lookup gate (the shuffle carries only
        # survivors) -> exact string join; probes the scan+explode+
        # Arrow-filter plane where the operator claims its win
        from htm_streamer_spark.operators.bloom import contaminated_pairs_bloom
        from htm_streamer_spark.operators.contamination import derive_ngram_probes
        probes = derive_ngram_probes(big, every=97, start=4, n=5)
        df = contaminated_pairs_bloom(big, probes, n=5)
    elif name == "cms":
        # counter-sketch family: 32M rows -> explode 4 md5 positions
        # (128M cells) -> map-side-combinable sum into <=4096 cells;
        # probes the pure hash+aggregate plane with a metadata output
        from htm_streamer_spark.operators.cms import cms_sketch
        wide = big.crossJoin(
            big.sparkSession.range(64).select(F.col("id").alias("rep"))
        ).select(((F.col("doc_id") + F.col("rep") * 911) % 100000).alias("item"))
        df = cms_sketch(wide, "item", d=4, w=1024)
    elif name == "pagerank":
        # iterative-graph family: 2M vertices x 5 synthetic out-edges
        # (hash-derived dst, so layout-independent), 5 damped power
        # iterations — each is one edges⋈ranks join + combinable sum +
        # vertex-sized left join with localCheckpoint lineage cuts;
        # probes the repeated-join plane none of the other families hit
        from htm_streamer_spark.operators.graph import pagerank
        n_v = 2_000_000
        verts = big.sparkSession.range(n_v).select(F.col("id").alias("src"))
        edges = verts.select(
            "src",
            F.explode(F.array(*[
                F.pmod(F.xxhash64("src", F.lit(i)), F.lit(n_v))
                for i in range(5)
            ])).alias("dst"),
        ).where(F.col("src") != F.col("dst"))
        # pagerank materializes its iterations EAGERLY during
        # construction (per-round dangling reduce + persist/count +
        # localCheckpoint lineage cuts), so the timed region must wrap
        # the construction — timing only the final count would measure
        # a metadata read of the checkpointed frame
        t0 = time.time()
        df = pagerank(edges, n_iter=5)
        n = df.count()
        return time.time() - t0, n
    elif name == "dup_span_extents":
        # gaps-and-islands family: 5-gram doc-frequency join back to
        # positions -> per-doc islands window; the span-merge twin of
        # the dup_spans fraction family
        from htm_streamer_spark.operators.repetition import dup_span_extents
        df = dup_span_extents(d, n=5, min_docs=2)
    elif name == "isotropy":
        # population-geometry family: 194 codegen agg expressions
        # (3 per dim + norm fold) over 1M dim-64 vectors, one
        # counter-row shuffle — the heaviest single-aggregate plan in
        # the repo; probes codegen-wide aggregate scaling
        from htm_streamer_spark.operators.veccheck import embedding_isotropy
        emb = spark.read.parquet({emb_xl!r}).withColumn(
            "label", (F.col("vec_id") % 20).cast("string"))
        df = embedding_isotropy(emb, "embedding", dim=64, group_by="label")
    else:
        raise ValueError(name)
    t0 = time.time()
    n = df.count()
    return time.time() - t0, n

import os as _os
_names = ("minhash_pairs", "tfidf", "global_shuffle", "unigram_nll", "chunk", "dup_spans", "spearman", "table_digest", "corr_matrix", "semdedup", "embed_integrity", "embed_dim_profile", "heaps", "source_overlap", "energy", "isotonic", "transition_jsd", "arrival_profile", "logrank", "kruskal", "isotropy", "bloom_decontam", "cms", "pagerank", "dup_span_extents")
_only = _os.environ.get("SPARK_GRAFT_FAMILIES")
if _only:
    _names = tuple(n for n in _names if n in _only.split(","))
out = {{}}
for name in _names:
    rows = None
    times = []
    for _ in range(repeats):
        # several operators persist() intermediates; Spark's
        # CacheManager matches identical plans, so a repeat would
        # silently reuse the previous run's cache and time only the
        # post-cache stages — clear it so every repeat is cold
        spark.catalog.clearCache()
        sec, rows = run(name)
        times.append(sec)
    out[name] = {{"best_sec": round(min(times), 3), "times": [round(t,3) for t in times], "rows": rows}}
print("RESULT " + __import__("json").dumps(out))
"""


def synthesize() -> None:
    if not EMB_BIG.exists():
        # 500x embedding replication (1M vectors): per-copy perturbation of the first
        # component keeps copies NEAR-duplicate (not bit-identical) so
        # the pruning pass sees realistic above/below-eps structure
        code = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from htm_streamer_spark import get_spark
from pyspark.sql import functions as F
spark = get_spark(cores=8, driver_memory="8g")
e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
copies = spark.range(500).select(F.col("id").cast("int").alias("copy"))
big = (e.crossJoin(copies)
       .select((F.col("vec_id") + F.col("copy") * 1_000_000).alias("vec_id"),
               F.concat(
                   F.array((F.element_at("embedding", 1) + F.col("copy") * F.lit(0.003)).cast("float")),
                   F.slice("embedding", 2, 63),
               ).alias("embedding")))
big.repartition(8).write.mode("overwrite").parquet({str(EMB_BIG)!r})
print("synthesized", big.count())
"""
        subprocess.run([sys.executable, "-c", code], check=True, timeout=600)
    if not EMB_XL.exists():
        # 8M-vector replication for the scan-bound veccheck families:
        # at 500k rows they finish in ~0.25s and fixed overhead buries
        # the parallelism signal; 8M rows puts the 8-core run at
        # multiple seconds so the N->4N ratio measures the operator
        code = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from htm_streamer_spark import get_spark
from pyspark.sql import functions as F
spark = get_spark(cores=8, driver_memory="8g")
e = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
copies = spark.range(8000).select(F.col("id").cast("int").alias("copy"))
big = (e.crossJoin(copies)
       .select((F.col("vec_id") + F.col("copy").cast("long") * 1_000_000).alias("vec_id"),
               F.concat(
                   F.array((F.element_at("embedding", 1) + F.col("copy") * F.lit(0.003)).cast("float")),
                   F.slice("embedding", 2, 63),
               ).alias("embedding")))
big.repartition(32).write.mode("overwrite").parquet({str(EMB_XL)!r})
print("synthesized", big.count())
"""
        subprocess.run([sys.executable, "-c", code], check=True, timeout=1200)
    todo = [(DOCS, 20), (DOCS_BIG, 100)]
    todo = [(p, n) for p, n in todo if not p.exists()]
    if not todo:
        return
    for path, n_copies in todo:
        code = f"""
import sys
sys.path.insert(0, {str(REPO)!r})
from htm_streamer_spark import get_spark
from pyspark.sql import functions as F
spark = get_spark(cores=8, driver_memory="8g")
d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
copies = spark.range({n_copies}).select(F.col("id").cast("int").alias("copy"))
big = (d.crossJoin(copies)
       .select((F.col("doc_id") + F.col("copy") * 1_000_000).alias("doc_id"),
               F.concat(F.col("text"), F.lit(" copytag"), F.col("copy").cast("string")).alias("text"),
               "lang", "source", F.col("n_chars")))
big.repartition(8).write.mode("overwrite").parquet({str(path)!r})
print("synthesized", big.count())
"""
        subprocess.run([sys.executable, "-c", code], check=True, timeout=600)


def run_level(cores: int, repeats: int) -> dict:
    code = _WORKER.format(
        repo=str(REPO), docs=str(DOCS), docs_big=str(DOCS_BIG), emb_big=str(EMB_BIG),
        emb_xl=str(EMB_XL)
    )
    out = subprocess.run(
        [sys.executable, "-c", code, str(cores), str(repeats)],
        capture_output=True, text=True, timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT line (rc={out.returncode}):\n{out.stderr[-2000:]}")


def _calibrate(cores: int) -> float:
    """Pure-CPU hardware ceiling at this thread count — same probe as
    tools/scaling_bench.py, so the families' raw efficiency can be
    normalized by what the host actually delivered in THIS window."""
    import importlib.util as iu

    spec = iu.spec_from_file_location("sb", REPO / "tools" / "scaling_bench.py")
    sb = iu.module_from_spec(spec)
    spec.loader.exec_module(sb)
    return sb.calibrate(cores)


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    synthesize()
    cal_lo = min(_calibrate(lo) for _ in range(2))
    cal_hi = min(_calibrate(hi) for _ in range(2))
    hw_speedup = cal_lo / cal_hi
    print(f"hardware calibration: pure-CPU {lo}->{hi} speedup = {hw_speedup:.2f}x", flush=True)
    levels = {}
    for cores in (lo, hi):
        t0 = time.time()
        levels[str(cores)] = run_level(cores, repeats)
        print(f"cores={cores}: {levels[str(cores)]} (wall {time.time()-t0:.0f}s)", flush=True)
    report = {"lo": lo, "hi": hi, "repeats": repeats, "levels": levels,
              "hw_speedup": round(hw_speedup, 2), "speedup": {}}
    for name in levels[str(lo)]:
        s = levels[str(lo)][name]["best_sec"] / levels[str(hi)][name]["best_sec"]
        report["speedup"][name] = round(s, 2)
        report.setdefault("raw_eff", {})[name] = round(s / (hi / lo), 2)
        report.setdefault("normalized_eff", {})[name] = round(s / hw_speedup, 2)
    out = REPO / "BENCH" / (sys.argv[4] if len(sys.argv) > 4 else "ops_scaling.json")
    out.write_text(json.dumps(report, indent=1))
    print("wrote", out, json.dumps(report["speedup"]), json.dumps(report["raw_eff"]))


if __name__ == "__main__":
    main()
