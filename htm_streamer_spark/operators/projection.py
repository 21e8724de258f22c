"""Seeded random projection (Johnson-Lindenstrauss sketch) of an
embedding column.

Dimensionality reduction is the standard pre-step before clustering /
ANN over high-dim embeddings at corpus scale: a k×d Rademacher matrix
R (entries ±1/√k) preserves pairwise L2 distances within (1±ε) for
k = O(log n / ε²) — distance geometry survives while per-row cost and
downstream shuffle width drop d/k-fold.

Spark shape: the matrix is TINY (k×d floats) and the data is huge, so
R ships as column literals — each output dim is one
``aggregate(zip_with(vec, R_j, x,w → x·w), sum)`` expression, pure
JVM codegen, ZERO shuffle, one scan, no UDF. (The join-on-dim-index
formulation would explode 100 TB of vectors into d rows each and
shuffle them — the wrong plan by d×.)

The matrix derives from a seeded ``numpy.default_rng`` so any engine
(and the DuckDB oracle) reproduces the identical sketch from the same
seed. Summation runs left-to-right over the vector in both engines
(double precision all the way), so values agree bit-for-bit before
the output rounding.

Long-format output (id, out_dim j, value) keeps every column scalar —
hash-friendly for cross-engine comparison; pivot back to an array
downstream if a vector column is wanted.

Reference analog: none — the reference profiles scalar features only;
this is part of the embedding toolchain (similarity.py IVF/PQ/LSH)
the Spark engine adds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rademacher_matrix", "random_projection"]


def rademacher_matrix(out_dim: int, in_dim: int, seed: int = 7) -> np.ndarray:
    """k×d matrix of ±1/√k, seeded — the shared artifact both the
    Spark plan and any oracle rebuild from (out_dim, in_dim, seed)."""
    rng = np.random.default_rng(seed)
    return rng.choice([-1.0, 1.0], size=(out_dim, in_dim)) / np.sqrt(out_dim)


def random_projection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    seed: int = 7,
    round_to: int | None = None,
) -> DataFrame:
    """(id, j, value): the k-dim JL sketch of ``vec_col``, one row per
    output dimension. Single scan, zero shuffle, no UDF."""
    mat = rademacher_matrix(out_dim, in_dim, seed)
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    outs = []
    for j in range(out_dim):
        row = F.array(*[F.lit(float(w)) for w in mat[j]])
        v = F.aggregate(
            F.zip_with(vec, row, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        if round_to is not None:
            v = F.round(v + F.lit(1e-12), round_to) + F.lit(0.0)
        outs.append(F.struct(F.lit(j).alias("j"), v.alias("value")))
    return df.select(
        F.col(id_col), F.explode(F.array(*outs)).alias("p")
    ).select(id_col, "p.j", "p.value")
