"""Token-array helpers.

Two tiers, per SURVEY.md §2.10:

1. **Native expressions** (preferred — JVM-side, whole-stage codegen):
   ``F.size`` / ``F.exists`` / ``F.forall`` / ``F.transform`` cover the
   invariants. These fuse into a single pass over the parquet scan.
2. **Vectorized Arrow pandas UDFs** (the north star's "vectorized Arrow
   UDFs" form of the same checks) — operate on Arrow column batches with
   numpy, never per-row Python. Kept as parity alternates and for the
   histogram-of-arrays case where the expression API can't reach.

Reference analogs: encoding width by construction
(/root/reference/htm_streamer/model/htm_model.py:34) for the length
invariant; the spatial range check (htm_model.py:305-312) for token
range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# native expressions (default hot path)
# ---------------------------------------------------------------------------


def token_oob_expr(tokens: Column, vocab_size: int) -> Column:
    """True if any token id is outside [0, vocab_size). Native ``F.exists``
    — short-circuits inside codegen, no Python."""
    return F.exists(tokens, lambda t: (t < F.lit(0)) | (t >= F.lit(vocab_size)))


def len_mismatch_expr(tokens: Column, n_tok: Column) -> Column:
    """True if n_tok is non-null and != len(tokens)."""
    return n_tok.isNotNull() & (F.size(tokens) != n_tok)


def token_bucket_expr(token: Column, buckets: int, vocab_size: int) -> Column:
    """Bucket a token id into ``buckets`` equal-width vocab bins —
    matches the oracle's ``(token * buckets) // vocab`` clipped to range."""
    b = F.floor((token.cast("long") * F.lit(buckets)) / F.lit(vocab_size))
    return F.greatest(F.lit(0), F.least(F.lit(buckets - 1), b)).cast("int")


def ntok_bucket_expr(n_tok: Column, buckets: int, ntok_max: int) -> Column:
    """Bucket n_tok into equal-width bins over [0, ntok_max] — matches the
    oracle's ``(clip(n) * buckets) // (ntok_max + 1)``."""
    n = F.greatest(F.lit(0), F.least(F.lit(ntok_max), n_tok.cast("long")))
    return F.floor((n * F.lit(buckets)) / F.lit(ntok_max + 1)).cast("int")


# ---------------------------------------------------------------------------
# vectorized Arrow pandas UDF alternates (no per-row Python: numpy on the
# flattened Arrow buffers)
# ---------------------------------------------------------------------------


def n_bad_tokens_udf(vocab_size: int):
    """pandas_udf: count of out-of-range token ids per row.

    Vectorized over the Arrow list column: explode once with numpy via the
    flattened values + per-row lengths, never a Python loop over rows.
    """

    @F.pandas_udf(T.IntegerType())
    def n_bad_tokens(tokens: pd.Series) -> pd.Series:
        lengths = tokens.map(len).to_numpy(dtype=np.int64)
        if lengths.sum() == 0:
            return pd.Series(np.zeros(len(tokens), dtype=np.int32))
        flat = np.concatenate([np.asarray(t, dtype=np.int64) for t in tokens])
        bad = ((flat < 0) | (flat >= vocab_size)).astype(np.int64)
        ends = np.cumsum(lengths)
        csum = np.concatenate([[0], np.cumsum(bad)])
        starts = ends - lengths
        per_row = csum[ends] - csum[starts]
        return pd.Series(per_row.astype(np.int32))

    return n_bad_tokens


def token_len_mismatch_udf():
    """pandas_udf: boolean n_tok != len(tokens) (null n_tok → null)."""

    @F.pandas_udf(T.BooleanType())
    def len_mismatch(tokens: pd.Series, n_tok: pd.Series) -> pd.Series:
        lengths = tokens.map(len).astype("float64")
        res = n_tok.astype("float64") != lengths
        res[n_tok.isna()] = None
        return res

    return len_mismatch


def token_hist_kernel(buckets: int, vocab_size: int):
    """Factory for the ``mapInArrow`` kernel: per-batch token-bucket
    histogram rows ``(part_id, bucket, cnt)`` — the histogram-of-arrays
    case where exploding every token through an aggregation is the
    bottleneck (measured 68s → ~4s at 280M tokens vs the explode plan).

    Operates zero-copy on the Arrow ListArray buffers: the flat values
    vector and the offsets vector go straight into numpy ``bincount`` —
    no per-row Python, no pandas object conversion (the north star's
    "vectorized Arrow UDFs, no per-row Python"). Each batch emits at
    most ``n_partitions × buckets`` rows, so the shuffle moves
    histograms, not tokens (the 10^12-row scale path).

    Defined as a closure (not a module-level function) so cloudpickle
    serializes it by value — executors need no package on PYTHONPATH.
    """

    def kernel(batch_iter):
        import pyarrow as pa

        for batch in batch_iter:
            if batch.num_rows == 0:
                continue
            tokens = batch.column(batch.schema.get_field_index("tokens"))
            part = batch.column(batch.schema.get_field_index("part_id"))
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            # zero-copy: flat token values + per-row lengths from offsets
            flat = tokens.flatten().to_numpy(zero_copy_only=False)
            offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lengths = np.diff(offsets)
            if flat.size == 0:
                continue
            hist = _clean_token_hist(
                flat,
                lengths,
                part.to_numpy(zero_copy_only=False),
                np.ones(batch.num_rows, dtype=bool),
                buckets,
                vocab_size,
                range_checked=False,
            )
            if hist is None:
                continue
            pid_out, bucket_out, cnt_out = hist
            yield pa.record_batch(
                {
                    "part_id": pa.array(pid_out, type=pa.int32()),
                    "bucket": pa.array(bucket_out, type=pa.int32()),
                    "cnt": pa.array(cnt_out, type=pa.int64()),
                }
            )

    return kernel


ROW_CHECKS_ALL = ("null_n_tok", "len_mismatch", "token_range", "empty_tokens", "bad_source")


def _n_bad_per_row(flat: np.ndarray, lengths: np.ndarray, vocab_size: int) -> np.ndarray:
    """Out-of-range token count per row. Skips the cumsum machinery on
    the (common) all-in-range batch — `.any()` is one cheap pass.

    For the int32 zero-copy buffer the two-sided test collapses to ONE
    unsigned compare (negatives reinterpret as >= 2^31 > vocab_size), a
    single pass instead of compare+compare+or over every token."""
    if flat.dtype == np.int32 and 0 < vocab_size <= 2**31 - 1:
        bad = flat.view(np.uint32) >= np.uint32(vocab_size)
    else:
        bad = (flat < 0) | (flat >= vocab_size)
    if not bad.any():
        return np.zeros(len(lengths), dtype=np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    csum = np.concatenate([[0], np.cumsum(bad)])
    return csum[ends] - csum[starts]


def _src_ok_mask(source_col, allowed: set) -> np.ndarray:
    """Vectorized membership via Arrow compute (C-side); nulls → False.
    Falls back to a Python set loop on any type mismatch."""
    import pyarrow as pa
    import pyarrow.compute as pc

    try:
        ok = pc.is_in(source_col, value_set=pa.array(sorted(allowed), type=source_col.type))
        return pc.fill_null(ok, False).to_numpy(zero_copy_only=False)
    except Exception:
        src = np.asarray(source_col.to_pylist(), dtype=object)
        return np.array([s in allowed for s in src])


def _clean_token_hist(
    flat: np.ndarray,
    lengths: np.ndarray,
    part: np.ndarray,
    clean: np.ndarray,
    buckets: int,
    vocab_size: int,
    range_checked: bool,
):
    """(part_id int32, bucket int32, cnt int64) arrays of the clean-row
    token-bucket histogram, or None when empty.

    Hot path kept narrow: token values stay in their zero-copy int32
    buffer; when the clean mask already enforced the range check the
    bucket math runs in int32 with no clip (np.clip alone was ~30% of
    the kernel); the row→token expansion repeats only the clean subset.
    """
    if not clean.any():
        return None
    if clean.all():
        flat_k = flat
        pid_k = np.repeat(part, lengths)
    else:
        keep = np.repeat(clean, lengths)
        flat_k = flat[keep]
        pid_k = np.repeat(part[clean], lengths[clean])
    if flat_k.size == 0:
        return None
    if range_checked and vocab_size * buckets < 2**31 and flat_k.dtype == np.int32:
        # values verified in [0, vocab): product fits int32, no clip
        b = (flat_k * np.int32(buckets)) // np.int32(vocab_size)
    else:
        b = (flat_k.astype(np.int64) * buckets) // vocab_size
        np.minimum(b, buckets - 1, out=b)
        np.maximum(b, 0, out=b)
    key = pid_k.astype(np.int64) * buckets + b
    cnt = np.bincount(key)
    nz = np.flatnonzero(cnt)
    return (
        (nz // buckets).astype(np.int32),
        (nz % buckets).astype(np.int32),
        cnt[nz].astype(np.int64),
    )


def _clean_mask(
    checks: tuple[str, ...],
    n_tok: np.ndarray,       # float64, NaN where null
    lengths: np.ndarray,     # int64, 0 for null lists
    tok_valid: np.ndarray,   # bool, False where tokens column is null
    n_bad: np.ndarray,       # int64 out-of-range count per row
    src_ok: np.ndarray,      # bool
) -> np.ndarray:
    """Row-is-clean mask from the ENABLED checks only, with exactly the
    native three-valued-logic outcome of ``filter(~any_violation)``: a
    row is clean iff every enabled flag evaluates to exactly False
    (null flags exclude the row, as in Spark)."""
    clean = np.ones(len(lengths), dtype=bool)
    nn = ~np.isnan(n_tok)
    if "null_n_tok" in checks:
        clean &= nn
    if "len_mismatch" in checks:
        # flag False iff n_tok null OR (tok_len non-null AND equal)
        clean &= ~nn | (tok_valid & (n_tok == lengths))
    if "token_range" in checks:
        clean &= n_bad == 0
    if "empty_tokens" in checks:
        # flag = coalesce(tok_len == 0, True): null tok_len is a violation
        clean &= tok_valid & (lengths > 0)
    if "bad_source" in checks:
        clean &= src_ok
    return clean


def featurize_hist_kernel(
    buckets: int,
    vocab_size: int,
    allowed_sources: tuple[str, ...],
    checks: tuple[str, ...] = ROW_CHECKS_ALL,
):
    """``mapInArrow`` kernel that produces BOTH outputs of the
    validation suite's token pass in one decode:

    - ``kind=0`` rows: the narrow per-row feature frame
      (doc_id, part_id, n_tok, source, ts, tok_len, tok_oob);
    - ``kind=1`` rows: the per-partition token-bucket histogram over
      clean rows (part_id, bucket, cnt).

    One pass over the token bytes feeds every downstream check — the
    suite's total token decode count drops to ONE. All numpy over
    zero-copy Arrow buffers; closure-defined for by-value pickling.
    """

    def kernel(batch_iter):
        import pyarrow as pa

        allowed = set(allowed_sources)
        for batch in batch_iter:
            if batch.num_rows == 0:
                continue
            idx = batch.schema.get_field_index
            tokens = batch.column(idx("tokens"))
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            flat = tokens.flatten().to_numpy(zero_copy_only=False)
            offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lengths = np.diff(offsets)
            tok_valid = tokens.is_valid().to_numpy(zero_copy_only=False)
            n_tok = batch.column(idx("n_tok")).to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            part = batch.column(idx("part_id")).to_numpy(zero_copy_only=False)

            n_bad = _n_bad_per_row(flat, lengths, vocab_size)
            src_ok = _src_ok_mask(batch.column(idx("source")), allowed)
            clean = _clean_mask(checks, n_tok, lengths, tok_valid, n_bad, src_ok)

            n = batch.num_rows
            row_batch = pa.record_batch(
                {
                    "kind": pa.array(np.zeros(n, dtype=np.int8), type=pa.int8()),
                    "doc_id": batch.column(idx("doc_id")),
                    "part_id": pa.array(part.astype(np.int32), type=pa.int32()),
                    "n_tok": batch.column(idx("n_tok")),
                    "source": batch.column(idx("source")),
                    "ts": batch.column(idx("ts")),
                    # null (not 0) where the tokens column is null, matching
                    # the native F.size(NULL) → NULL of featurize()
                    "tok_len": pa.array(lengths.astype(np.int32), mask=~tok_valid, type=pa.int32()),
                    "tok_oob": pa.array(n_bad > 0, type=pa.bool_()),
                    "bucket": pa.array([None] * n, type=pa.int32()),
                    "cnt": pa.array([None] * n, type=pa.int64()),
                }
            )
            yield row_batch

            hist = _clean_token_hist(
                flat, lengths, part, clean, buckets, vocab_size,
                range_checked="token_range" in checks,
            )
            if hist is not None:
                pid_out, bucket_out, cnt_out = hist
                m = len(pid_out)
                yield pa.record_batch(
                    {
                        "kind": pa.array(np.ones(m, dtype=np.int8), type=pa.int8()),
                        "doc_id": pa.array([None] * m, type=pa.string()),
                        "part_id": pa.array(pid_out, type=pa.int32()),
                        "n_tok": pa.array([None] * m, type=pa.int32()),
                        "source": pa.array([None] * m, type=pa.string()),
                        "ts": pa.nulls(m, type=row_batch.column(5).type),
                        "tok_len": pa.array([None] * m, type=pa.int32()),
                        "tok_oob": pa.array([None] * m, type=pa.bool_()),
                        "bucket": pa.array(bucket_out, type=pa.int32()),
                        "cnt": pa.array(cnt_out, type=pa.int64()),
                    }
                )

    return kernel


def checked_token_hist_kernel(
    buckets: int,
    vocab_size: int,
    allowed_sources: tuple[str, ...],
    checks: tuple[str, ...] = ROW_CHECKS_ALL,
):
    """``mapInArrow`` kernel that fuses the row-validity checks with the
    token-bucket histogram: input batches carry (part_id, tokens, n_tok,
    source); rows failing ANY check (null/len-mismatch/out-of-range/
    empty/bad-source) are excluded from the histogram, all in vectorized
    numpy over the zero-copy Arrow buffers. This makes the histogram the
    ONLY pass that touches token bytes besides the featurize projection
    — the validation suite decodes the token column exactly twice.
    """

    def kernel(batch_iter):
        import pyarrow as pa

        allowed = set(allowed_sources)
        for batch in batch_iter:
            if batch.num_rows == 0:
                continue
            tokens = batch.column(batch.schema.get_field_index("tokens"))
            if isinstance(tokens, pa.ChunkedArray):
                tokens = tokens.combine_chunks()
            flat = tokens.flatten().to_numpy(zero_copy_only=False)
            offsets = tokens.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            lengths = np.diff(offsets)
            tok_valid = tokens.is_valid().to_numpy(zero_copy_only=False)
            n_tok = batch.column(batch.schema.get_field_index("n_tok")).to_numpy(
                zero_copy_only=False
            ).astype(np.float64)  # NaN for nulls
            part = batch.column(batch.schema.get_field_index("part_id")).to_numpy(
                zero_copy_only=False
            )

            n_bad = _n_bad_per_row(flat, lengths, vocab_size)
            src_ok = _src_ok_mask(batch.column(batch.schema.get_field_index("source")), allowed)
            clean = _clean_mask(checks, n_tok, lengths, tok_valid, n_bad, src_ok)
            hist = _clean_token_hist(
                flat, lengths, part, clean, buckets, vocab_size,
                range_checked="token_range" in checks,
            )
            if hist is None:
                continue
            pid_out, bucket_out, cnt_out = hist
            yield pa.record_batch(
                {
                    "part_id": pa.array(pid_out, type=pa.int32()),
                    "bucket": pa.array(bucket_out, type=pa.int32()),
                    "cnt": pa.array(cnt_out, type=pa.int64()),
                }
            )

    return kernel
