"""Fuzzy (edit-distance) matching against a reference list — the
record-linkage / canonicalization step of data cleaning: map free-form
strings (source labels, entity names, near-miss duplicates) onto a
curated vocabulary, tolerating typos up to ``max_dist`` edits.

Scale notes (100 TB):
- The reference list is dimension-sized (a vocabulary, a gazetteer):
  broadcast it. The join condition is non-equi, so this is a
  broadcast nested-loop join — each corpus row scans the broadcast
  list map-side, NO shuffle; total cost is linear in corpus size with
  a |ref| constant. That constant is the contract: keep ``ref`` at
  vocabulary scale (<= ~10^4). Corpus-vs-corpus fuzzy matching needs
  a blocking scheme (MinHash/SimHash tiers here) instead.
- The length band |len(s) - len(r)| <= max_dist is a sound lower
  bound on edit distance (each edit changes length by at most 1) and
  is evaluated before the O(len^2) ``levenshtein``, short-circuiting
  most of the broadcast list per row. First-character or prefix bands
  are NOT sound (a single substitution at position 1 breaks them) and
  are deliberately absent.
- ``levenshtein`` runs JVM-side (codegen); no Python anywhere.
- Ties (equal distance to several references) break to the lexically
  smallest reference — deterministic on every engine.

Reference analog: none (the reference validates numeric sequences);
this is the string-side cleaning tier a corpus pipeline adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match(
    df: DataFrame,
    ref: DataFrame,
    *,
    col: str = "source",
    ref_col: str = "name",
    max_dist: int = 2,
    keys: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(keys..., value, match, dist): best reference match within
    ``max_dist`` edits for each row's ``col`` value; unmatched rows are
    kept with null match/dist (left join semantics — cleaning must not
    drop rows).

    ``ref`` is broadcast — it must be dimension-sized. Exact matches
    resolve at distance 0 through the same path.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    s = F.col("_val")
    r = F.col(ref_col)
    cond = (F.abs(F.length(s) - F.length(r)) <= max_dist) & (
        F.levenshtein(s, r) <= max_dist
    )
    left = df.select(*keys, F.col(col).alias("_val"))
    cand = left.join(F.broadcast(ref.select(ref_col)), cond, "left")
    dist = F.levenshtein(s, r)
    return (
        cand.groupBy(*keys, "_val")
        .agg(
            F.min(
                F.when(r.isNotNull(), F.struct(dist.alias("d"), r.alias("m")))
            ).alias("b")
        )
        .select(
            *keys,
            F.col("_val").alias("value"),
            F.col("b.m").alias("match"),
            F.col("b.d").cast("int").alias("dist"),
        )
    )
