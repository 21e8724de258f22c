"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exactness baseline. Query vectors are a
  small broadcast side; the corpus scan is one pass; the dot product is
  a native ``F.aggregate(F.zip_with(...))`` expression (codegen, no
  Python). Top-k per query via window row_number.
- LSH-bucketed (random hyperplane) ANN: the scale path. Each vector gets
  a B-bit signature (sign of dot with B fixed pseudo-random hyperplanes);
  candidates share a signature bucket, exact cosine re-ranks inside the
  bucket. At 10^12 rows the bucket join replaces the full scan per query.

Hyperplanes are generated deterministically from a seed via the same
splitmix64 scheme as the fixtures, so signatures are reproducible across
runs and engines.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )


def cosine_expr(a, b):
    """Native cosine similarity between two float-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: (query_id, vec_id, cosine, rank). Queries are
    broadcast (small by contract); one corpus scan total."""
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k, matmul form: same answer and same output
    schema as :func:`brute_force_topk` (asserted equal in
    tests/test_graph.py on the real fixture), but the scoring is ONE
    float64 numpy matmul per Arrow batch — (batch × dim) · (dim × m) —
    instead of a per-pair interpreted array fold, which at m×n pair
    counts is the difference between BLAS and 10^8 lambda evaluations
    (measured 68s → ~2s for the 2000² bench graph).

    Per batch the kernel emits only each query's batch-local top-k
    (argpartition per column), so the global window ranks
    batches × k × m candidate rows, never the full n × m score matrix.
    Queries are driver-collected and broadcast — small by the same
    contract as the broadcast in the expression form. Zero-norm
    vectors score 0 instead of the expression form's null/NaN, and
    NULL-embedding rows are filtered out before the kernel (the
    expression form would carry them with NULL cosine; unfiltered they
    would break the fixed-width reshape) — the two disclosed semantic
    differences (no such vectors pass ``embedding_integrity``)."""
    import pyarrow as pa

    # Arrow collect: the row-based .collect() of (id, vector) rows pays
    # py4j/pickle row materialization (~seconds at 10^4 queries); the
    # same frame lands as two Arrow columns in a fraction of that
    q_tab = queries.select(query_id_col, vec_col).toArrow()
    if q_tab.num_rows == 0:
        return corpus.sparkSession.createDataFrame(
            [],
            corpus.select(
                F.lit(None).cast(queries.schema[query_id_col].dataType).alias(query_id_col),
                F.col(id_col),
                F.lit(0.0).alias("cosine"),
                F.lit(0).alias("rank"),
            ).schema,
        )
    qids = q_tab.column(0).to_pylist()
    Q = np.asarray(q_tab.column(1).to_pylist(), dtype=np.float64)
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0.0] = 1.0
    bc = corpus.sparkSession.sparkContext.broadcast((qids, Q / qn))
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    id_type = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} {qid_type}, {id_col} {id_type}, cosine double"

    def kernel(batch_iter):
        ids_b, Qn = bc.value
        ids_arr = np.asarray(ids_b)
        m = Qn.shape[0]
        for batch in batch_iter:
            n = batch.num_rows
            if n == 0:
                continue
            ids = np.asarray(batch.column(0).to_pylist())
            vals = np.asarray(batch.column(1).flatten(), dtype=np.float64)
            V = vals.reshape(n, -1)  # equal dims guaranteed upstream
            vn = np.linalg.norm(V, axis=1, keepdims=True)
            vn[vn == 0.0] = 1.0
            S = (V / vn) @ Qn.T  # (n, m)
            kk = min(k, n)
            # batch-local top-k per query column, emitted fully
            # vectorized (a Python loop over m queries costs more than
            # the matmul at m ~ corpus size)
            if kk < n:
                top = np.argpartition(-S, kk - 1, axis=0)[:kk]  # (kk, m)
            else:
                top = np.broadcast_to(
                    np.arange(n)[:, None], (n, m)
                )  # every row is a candidate
            flat_i = top.ravel(order="F")  # row indices grouped by query
            flat_j = np.repeat(np.arange(m), kk)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids_arr, kk)),
                    pa.array(ids[flat_i]),
                    pa.array(S[flat_i, flat_j], pa.float64()),
                ],
                names=[query_id_col, id_col, "cosine"],
            )

    from htm_streamer_spark.operators.dedup import fan_out_narrow_scans

    cand = (
        # the scoring matmul inherits the scan's split count — fan the
        # narrow (id, vec) projection out first so a single-row-group
        # input does not serialize the whole corpus×queries matmul onto
        # one core (guide §2.5 input skew; no-op at real scale)
        fan_out_narrow_scans(corpus.select(id_col, vec_col))
        # NULL embeddings would silently shrink flatten()'s value buffer
        # and break the fixed-width reshape below — drop them up front
        # (the expression form degrades to NULL cosine for these rows,
        # which the top-k window would discard anyway).
        .where(F.col(vec_col).isNotNull())
        .mapInArrow(kernel, out_schema)
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return cand.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes via splitmix64 → N(0,1)
    (Box-Muller), reproducible everywhere."""
    m = np.uint64(0xFFFFFFFFFFFFFFFF)
    idx = np.arange(bits * dim * 2, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (idx + np.uint64(seed) * np.uint64(0x9E3779B97F4A7C15)) & m
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & m
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & m
        x = x ^ (x >> np.uint64(31))
    u = (x.astype(np.float64) + 0.5) / 2.0**64
    u1, u2 = u[: bits * dim], u[bits * dim :]
    z = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return z.reshape(bits, dim)


def lsh_signature_col(vec_col, planes: np.ndarray):
    """Signature bits packed into one long: bit b = sign(vec · plane_b).
    Pure expression — each plane's dot is an F.aggregate over zip_with
    against a literal array (folded by Catalyst).

    Use only for SMALL bits×dim (≲2048 literals): the expression tree
    carries bits×dim literals through codegen. At real embedding dims
    (768×12 ≈ 9k literals) use :func:`lsh_signatures_arrow` instead."""
    bits = []
    for b in range(planes.shape[0]):
        lit_plane = F.array(*[F.lit(float(v)) for v in planes[b]])
        d = _dot(vec_col, lit_plane)
        bits.append(F.when(d > 0, F.lit(1 << b)).otherwise(F.lit(0)))
    sig = bits[0]
    for x in bits[1:]:
        sig = sig + x
    return sig.cast("long")


# expression-tree literal budget above which signatures switch to the
# Arrow matmul kernel (bits × dim literals through codegen is a
# compile-time bomb at real embedding dims)
LSH_EXPR_MAX_LITERALS = 2048


def lsh_signatures_arrow(
    df: DataFrame,
    planes: np.ndarray,
    passthrough_cols: list[str],
    vec_col: str = "embedding",
    sig_col: str = "sig",
) -> DataFrame:
    """(passthrough_cols..., vec_col, sig_col): signatures via ONE numpy
    matmul per Arrow batch — (rows × dim) · (dim × bits) — instead of a
    bits×dim-literal expression tree. The scale path for dim ≥ ~256.
    No per-row Python: rows reshape zero-copy from the flattened
    ListArray values buffer (fixed dim per batch)."""
    bits, dim = planes.shape
    pt = np.ascontiguousarray(planes.T)  # dim × bits
    weights = (1 << np.arange(bits, dtype=np.uint64)).astype(np.float64)
    in_cols = [*passthrough_cols, vec_col]
    in_schema = df.select(*in_cols).schema
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields
    )

    def kernel(batch_iter):
        import pyarrow as pa

        for batch in batch_iter:
            if batch.num_rows == 0:
                continue
            vecs = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(batch.num_rows, dim)
            dots = mat @ pt  # rows × bits
            sig = ((dots > 0).astype(np.float64) @ weights).astype(np.int64)
            cols = {name: batch.column(batch.schema.get_field_index(name)) for name in in_cols}
            cols[sig_col] = pa.array(sig, type=pa.int64())
            yield pa.record_batch(cols)

    return df.select(*in_cols).mapInArrow(kernel, schema=f"{out_fields}, {sig_col} long")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH.

    Corpus is bucketed by its ``bits``-bit signature (one scan, one
    shuffle on the signature). Each query probes its own bucket plus all
    buckets within ``probe_hamming`` bit flips (multi-probe — recall
    knob). Exact cosine re-ranks candidates. Returns
    (query_id, vec_id, cosine, rank)."""
    planes = _hyperplanes(dim, bits, seed)
    if bits * dim > LSH_EXPR_MAX_LITERALS:
        c = lsh_signatures_arrow(corpus, planes, [id_col], vec_col, "sig")
        q = lsh_signatures_arrow(queries, planes, [query_id_col], vec_col, "qsig").select(
            query_id_col, F.col(vec_col).alias("_qvec"), "qsig"
        )
    else:
        c = corpus.select(id_col, vec_col, lsh_signature_col(F.col(vec_col), planes).alias("sig"))
        q = queries.select(
            query_id_col,
            F.col(vec_col).alias("_qvec"),
            lsh_signature_col(F.col(vec_col), planes).alias("qsig"),
        )
    # multi-probe: expand each query to its probe signatures
    probes = [F.col("qsig")]
    if probe_hamming >= 1:
        probes += [
            F.col("qsig").bitwiseXOR(F.lit(1 << b)) for b in range(bits)
        ]
    if probe_hamming >= 2:
        probes += [
            F.col("qsig").bitwiseXOR(F.lit((1 << b1) | (1 << b2)))
            for b1 in range(bits)
            for b2 in range(b1 + 1, bits)
        ]
    q_probed = q.select(
        query_id_col, "_qvec", F.explode(F.array(*probes)).alias("sig")
    )
    cand = c.join(F.broadcast(q_probed), "sig")
    scored = cand.select(
        query_id_col, id_col, cosine_expr(F.col(vec_col), F.col("_qvec")).alias("cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 256,
) -> DataFrame:
    """Embedding-cosine near-dup detection: bucket by LSH signature,
    pair within buckets, keep cosine >= threshold. (doc pairs with
    doc_a < doc_b). The all-pairs explosion is bounded per bucket."""
    planes = _hyperplanes(dim, bits, seed)
    if bits * dim > LSH_EXPR_MAX_LITERALS:
        sigs = lsh_signatures_arrow(df, planes, [id_col], vec_col, "sig")
    else:
        sigs = df.select(id_col, vec_col, lsh_signature_col(F.col(vec_col), planes).alias("sig"))
    # count first, then collect only qualifying buckets — a post-collect
    # filter would still materialize an oversized bucket (vectors are
    # heavy) on one reducer before dropping it
    keep = (
        sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("n") <= max_bucket))
        .select("sig")
    )
    buckets = (
        sigs.join(keep, "sig", "left_semi")
        .groupBy("sig")
        .agg(
            F.collect_list(F.struct(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))).alias(
                "items"
            )
        )
    )
    pairs = buckets.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "items",
                        lambda a: F.transform(
                            F.col("items"),
                            lambda b: F.struct(
                                a["id"].alias("id_a"),
                                b["id"].alias("id_b"),
                                a["v"].alias("va"),
                                b["v"].alias("vb"),
                            ),
                        ),
                    )
                ),
                lambda p: p["id_a"] < p["id_b"],
            )
        ).alias("p")
    ).select(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        cosine_expr(F.col("p.va"), F.col("p.vb")).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold).distinct()


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _kmeans_fit(sample: np.ndarray, n_lists: int, seed: int = 42, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means on a driver-side SAMPLE (the standard IVF
    training recipe — coarse quantizers train offline on a bounded
    sample, never the full corpus). Returns (n_lists, dim) centroids."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_lists, len(sample)), replace=False)
    cents = sample[idx].astype(np.float64).copy()
    for _ in range(iters):
        d = sample @ cents.T  # cosine-ish assignment on normalized input
        assign = np.argmax(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    return cents


def train_coarse_quantizer(
    corpus: DataFrame,
    n_lists: int,
    *,
    train_sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Seeded spherical k-means centroids from a bounded UNIFORM
    content-hash sample of the corpus (the IVF training recipe,
    extracted so clustering can be used standalone).

    The sample is ``md5(id)``-thresholded + smallest-hash ordered, so it
    is reproducible across engines, partitionings, and cluster sizes —
    a ``limit()`` prefix sample would train on whatever slice the scan
    returns first (the recall-bias failure pinned by
    tests/test_similarity.py's sorted-skewed-corpus case). Vectors come
    back via Arrow (vector column only), never a row-collect."""
    n_corpus = corpus.count()  # parquet metadata count, not a data scan
    # deterministic content-hash in [0, 2^60): md5 keeps the sample
    # reproducible across engines/partitionings (xxhash64 is Spark-only)
    hash_col = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    sampled = corpus.select(F.col(vec_col), hash_col.alias("_h"))
    if n_corpus > train_sample:
        # oversample 2x by hash-threshold, then take the smallest hashes
        # (TakeOrderedAndProject — a top-k, not a full sort shuffle)
        threshold = int((1 << 60) * min(1.0, 2.0 * train_sample / n_corpus))
        sampled = sampled.filter(F.col("_h") < threshold)
    pdf = sampled.orderBy("_h").limit(train_sample).toPandas()
    sample = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return _kmeans_fit(sample / norms, n_lists, seed)


def kmeans_cluster_profile(
    corpus: DataFrame,
    n_clusters: int = 16,
    *,
    train_sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding k-means clustering as a first-class operator: train a
    seeded quantizer on the bounded hash-sample, assign EVERY vector
    with one numpy matmul per Arrow batch, and profile the clusters.

    Returns (cluster_id, n_vecs, min_vec_id, max_vec_id) — integer
    stats only, so the result is bit-deterministic regardless of
    partition/accumulation order (a float mean would not be) and can be
    pinned by a golden-parquet oracle. One corpus scan for training
    (vector column, bounded), one for assignment; the profile is a
    single groupBy(cluster_id) with map-side partials."""
    cents = train_coarse_quantizer(
        corpus, n_clusters, train_sample=train_sample, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )
    assigned = ivf_assign_arrow(corpus, cents, [id_col], vec_col, "cluster_id")
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"),
        F.min(id_col).alias("min_vec_id"),
        F.max(id_col).alias("max_vec_id"),
    )


def ivf_assign_arrow(df: DataFrame, centroids: np.ndarray, passthrough_cols: list[str],
                     vec_col: str = "embedding", list_col: str = "list_id") -> DataFrame:
    """Assign every vector to its nearest centroid with ONE numpy matmul
    per Arrow batch (rows × dim · dim × n_lists → argmax). No per-row
    Python; the centroid matrix ships in the closure (tiny)."""
    n_lists, dim = centroids.shape
    cT = np.ascontiguousarray(centroids.T)
    in_cols = [*passthrough_cols, vec_col]
    in_schema = df.select(*in_cols).schema
    out_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in in_schema.fields)

    def kernel(batch_iter):
        import pyarrow as pa

        for batch in batch_iter:
            if batch.num_rows == 0:
                continue
            vecs = batch.column(batch.schema.get_field_index(vec_col))
            if isinstance(vecs, pa.ChunkedArray):
                vecs = vecs.combine_chunks()
            flat = vecs.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            mat = flat.reshape(batch.num_rows, dim)
            assign = np.argmax(mat @ cT, axis=1).astype(np.int32)
            cols = {name: batch.column(batch.schema.get_field_index(name)) for name in in_cols}
            cols[list_col] = pa.array(assign, type=pa.int32())
            yield pa.record_batch(cols)

    return df.select(*in_cols).mapInArrow(kernel, schema=f"{out_fields}, {list_col} int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    train_sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: train a coarse quantizer on a bounded
    sample, bucket the corpus by nearest centroid (one scan, one numpy
    matmul pass), probe each query's ``nprobe`` nearest lists, exact
    cosine re-rank inside the probed lists.

    Scale shape: corpus assignment is a single mapInArrow pass + shuffle
    on list_id; queries broadcast; per-query work is corpus/n_lists ×
    nprobe instead of the full scan. Returns (query_id, vec_id, cosine,
    rank).

    The k-means training sample is a seeded UNIFORM hash-sample of the
    corpus (``md5(id) % D < D·fraction``), not a first-files prefix — a
    ``limit(...)`` sample is whatever partition the scan returns first,
    which at scale trains centroids on one source slice and silently
    degrades recall everywhere else. Vectors come back via Arrow
    (``toPandas`` of the vector column only), never a row-collect, and
    the sample is ordered by the same hash so centroid seeding is
    partition-layout independent.
    """
    cents = train_coarse_quantizer(
        corpus, n_lists, train_sample=train_sample, id_col=id_col,
        vec_col=vec_col, seed=seed,
    )

    c = ivf_assign_arrow(corpus, cents, [id_col], vec_col, "list_id")
    # query probes: nprobe nearest centroids, driver-side (queries small)
    q_rows = queries.select(query_id_col, vec_col).collect()
    spark = corpus.sparkSession
    probe_rows = []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        nv = np.linalg.norm(v)
        d = cents @ (v / nv if nv > 0 else v)
        for li in np.argsort(-d)[:nprobe]:
            probe_rows.append((r[0], [float(x) for x in r[1]], int(li)))
    # derive the query-id type from the input (string/int32/... ids all
    # work — a hardcoded 'long' would mis-type the join)
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    q_probed = spark.createDataFrame(
        probe_rows, f"{query_id_col} {qid_type}, _qvec array<double>, list_id int"
    )
    cand = c.join(F.broadcast(q_probed), "list_id")
    scored = cand.select(
        query_id_col, id_col,
        cosine_expr(F.col(vec_col).cast("array<double>"), F.col("_qvec")).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third ANN tier: brute force (exact
# baseline) < LSH buckets < IVF lists < PQ codes. PQ compresses each
# vector to M small codebook indices (here M bytes at n_codes<=256), so
# the scoring scan reads codes instead of floats — at 100 TB the
# difference between scanning 256 GB of codes and 100 TB of vectors.
# Jégou/Douze/Schmid, "Product Quantization for Nearest Neighbor
# Search" (TPAMI 2011) — ADC variant (asymmetric distance computation).


def _kmeans_euclid(sample: np.ndarray, n_codes: int, seed: int, iters: int = 10) -> np.ndarray:
    """Seeded Lloyd k-means under plain Euclidean distance (PQ codebooks
    quantize raw subvectors; the spherical variant above is only right
    for whole normalized vectors)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_codes, len(sample)), replace=False)
    cents = sample[idx].astype(np.float64).copy()
    for _ in range(iters):
        # ||v-c||^2 argmin == argmax (v.c - ||c||^2/2)
        d = sample @ cents.T - 0.5 * (cents * cents).sum(axis=1)
        assign = np.argmax(d, axis=1)
        for c in range(len(cents)):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def pq_train(sample: np.ndarray, m: int, n_codes: int, seed: int = 42) -> np.ndarray:
    """Codebooks (m, n_codes, dim//m) from a driver-side sample of
    NORMALIZED vectors (normalizing first makes the ADC dot product an
    approximate cosine)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return np.stack(
        [
            _kmeans_euclid(sample[:, i * sub : (i + 1) * sub], n_codes, seed + i)
            for i in range(m)
        ]
    )


def pq_encode_arrow(
    df: DataFrame,
    codebooks: np.ndarray,
    passthrough_cols: list[str],
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Encode every vector to its M codebook indices in one numpy pass
    per Arrow batch (vectors are L2-normalized first). The codes frame
    is what a production pipeline persists — M ints instead of dim
    floats per row."""
    import pyarrow as pa

    m, n_codes, sub = codebooks.shape
    dim = m * sub
    books = codebooks.copy()
    half_norm = 0.5 * (books * books).sum(axis=2)  # (m, n_codes)

    def encode(batches):
        for batch in batches:
            tbl = pa.table(batch)
            vecs = np.asarray(tbl[vec_col].combine_chunks().flatten(), dtype=np.float64)
            n = len(tbl)
            V = vecs.reshape(n, dim) if n else np.empty((0, dim))
            norms = np.linalg.norm(V, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            V = V / norms
            codes = np.empty((n, m), dtype=np.int32)
            for i in range(m):
                S = V[:, i * sub : (i + 1) * sub]
                codes[:, i] = np.argmax(S @ books[i].T - half_norm[i], axis=1)
            cols = {c: tbl[c].combine_chunks() for c in passthrough_cols}
            cols[code_col] = pa.array(list(codes), type=pa.list_(pa.int32()))
            yield pa.RecordBatch.from_pydict(cols)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in passthrough_cols
    )
    return df.select(*passthrough_cols, vec_col).mapInArrow(
        encode, schema=f"{out_schema}, {code_col} array<int>"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    refine: int = 4,
    train_sample: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
) -> DataFrame:
    """PQ-ADC approximate top-k with exact re-rank: encode the corpus to
    M codebook indices, score every row against every query by summing
    M lookup-table entries (no float vector reads), keep the global
    top-(k·refine) per query by ADC, re-rank those exactly by cosine.
    Returns (query_id, vec_id, cosine, rank).

    Partition-independent by construction: the scoring kernel emits each
    batch's per-query top-T (T = k·refine, ties broken by id hash) —
    the GLOBAL top-T under the same total order is contained in that
    union for every possible partitioning, so the window that extracts
    it gives the same T candidates however the scan was split. The
    final exact re-rank of those T is then trivially deterministic.

    Training reuses IVF's seeded content-hash uniform sample (never a
    first-files prefix).
    """
    import pyarrow as pa

    # queries are collected anyway (the LUTs are built driver-side);
    # an empty query set must short-circuit here — otherwise the Arrow
    # kernel's np.concatenate([]) raises inside the task
    q_rows = queries.select(query_id_col, vec_col).collect()
    qid_type = queries.schema[query_id_col].dataType.simpleString()
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], f"{query_id_col} {qid_type}, {id_col} long, cosine double, rank int"
        )

    n_corpus = corpus.count()  # parquet metadata count, not a data scan
    hash_col = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    sampled = corpus.select(F.col(vec_col), hash_col.alias("_h"))
    if n_corpus > train_sample:
        threshold = int((1 << 60) * min(1.0, 2.0 * train_sample / n_corpus))
        sampled = sampled.filter(F.col("_h") < threshold)
    pdf = sampled.orderBy("_h").limit(train_sample).toPandas()
    sample = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    books = pq_train(sample / norms, m, n_codes, seed)
    sub = dim // m

    encoded = pq_encode_arrow(corpus, books, [id_col], vec_col)

    # per-query lookup tables: LUT[q, i, c] = q_sub_i · codebook[i][c]
    qids = [r[0] for r in q_rows]
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    qn[qn == 0] = 1.0
    Q = Q / qn
    lut = np.stack(
        [Q[:, i * sub : (i + 1) * sub] @ books[i].T for i in range(m)], axis=1
    )  # (n_q, m, n_codes)
    top_t = k * refine
    n_q = len(qids)

    def adc_score(batches):
        for batch in batches:
            tbl = pa.table(batch)
            n = len(tbl)
            if not n:
                continue
            ids = tbl[id_col].combine_chunks().to_numpy().astype(np.int64)
            codes = np.asarray(
                tbl["codes"].combine_chunks().flatten(), dtype=np.int64
            ).reshape(n, m)
            out_q, out_id, out_adc = [], [], []
            for qi in range(n_q):
                # gather+sum: one vectorized lookup per subspace
                adc = lut[qi, 0][codes[:, 0]]
                for i in range(1, m):
                    adc = adc + lut[qi, i][codes[:, i]]
                t = min(top_t, n)
                # total order (adc desc, id asc): batch top-T under this
                # order always contains the batch's members of the
                # global top-T under the same order
                order = np.lexsort((ids, -adc))[:t]
                out_q.append(np.full(t, qi, dtype=np.int64))
                out_id.append(ids[order])
                out_adc.append(adc[order])
            yield pa.RecordBatch.from_pydict(
                {
                    "_qi": pa.array(np.concatenate(out_q)),
                    id_col: pa.array(np.concatenate(out_id)),
                    "adc": pa.array(np.concatenate(out_adc)),
                }
            )

    cand = encoded.mapInArrow(adc_score, schema=f"_qi long, {id_col} long, adc double")
    w_adc = Window.partitionBy("_qi").orderBy(F.desc("adc"), F.asc(id_col))
    shortlist = cand.withColumn("_r", F.row_number().over(w_adc)).filter(
        F.col("_r") <= top_t
    )

    spark = corpus.sparkSession
    qmap = spark.createDataFrame(
        [(int(i), r[0], [float(x) for x in r[1]]) for i, r in enumerate(q_rows)],
        f"_qi long, {query_id_col} {qid_type}, _qvec array<double>",
    )
    exact = (
        shortlist.join(
            corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("_cvec")),
            id_col,
        )
        .join(F.broadcast(qmap), "_qi")
        .select(
            query_id_col,
            id_col,
            cosine_expr(F.col("_cvec"), F.col("_qvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return exact.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
