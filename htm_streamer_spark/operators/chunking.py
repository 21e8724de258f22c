"""Document chunking: overlapping token windows — the preprocessing
step every embedding / retrieval pipeline runs before encoding
(context-window-sized chunks with stride overlap so no boundary
sentence is lost).

Scale notes (100 TB):
- Pure codegen array expressions inside the scan: split once, emit
  chunk ids with ``sequence``+``explode``, slice the SHARED token
  array per chunk — the text is tokenized exactly once per document
  and never leaves the executor as intermediate chunks.
- Zero shuffles: chunking is embarrassingly parallel per document;
  the output is (doc, chunk) grained and flows straight into the
  encoder stage (mapInArrow at real scale — the multimodal/similarity
  kernels show that shape).
- Chunk counts use exact integer arithmetic
  ((n - size + stride - 1) div stride + 1), reproducible on any
  engine — no float ceil.

Reference analog: none (single-row encoders); this is the Spark-first
shape of corpus-to-encoder fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_tokens(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk_size)``
    (1-based slice internally); the last chunk is the tail remainder.
    Documents with no tokens produce no chunks. ``stride`` <
    ``chunk_size`` gives overlap; ``stride == chunk_size`` is exact
    tiling.

    Returns (id_col, chunk_id, n_tokens, chunk_hash) where chunk_hash
    is md5 of the space-joined chunk tokens — the compact,
    oracle-comparable chunk identity (the chunk text itself stays
    inside the plan; downstream encoders re-slice from the shared
    token array).
    """
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_size and stride must be >= 1")
    if stride > chunk_size:
        raise ValueError(
            f"stride ({stride}) > chunk_size ({chunk_size}) would skip tokens"
        )
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.when(
        n <= chunk_size, F.lit(1)
    ).otherwise(
        ((n - F.lit(chunk_size) + F.lit(stride - 1)) / F.lit(stride))
        .cast("int")
        + F.lit(1)
    )
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        id_col, toks.alias("_toks"), n_chunks.alias("_nc")
    )
    exploded = base.select(
        id_col,
        "_toks",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1
    chunk = F.slice(F.col("_toks"), start, chunk_size)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )
