"""Hot-key-safe equi-join via salting: replicate the small side N ways
and scatter the large side's hot keys across the replicas.

When to use which skew weapon:
- AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on in this
  repo's sessions) splits oversized sort-merge partitions at runtime —
  prefer it when the join IS sort-merge and the skew is visible in
  partition sizes.
- ``broadcast(small)`` removes the shuffle entirely — prefer it when
  the small side fits in executor memory.
- THIS operator is for the remaining case: the small side is too big
  to broadcast, the join must shuffle, and one key's row count melts a
  single reducer (bot user, null-ish sentinel key, header stopword).
  Salting bounds the largest reducer at hot_key_rows / n_salts.

Correctness: the large side computes a deterministic per-row salt in
[0, n_salts); the small side is replicated once per salt value; the
equi-join runs on (keys + salt). Every large row matches EXACTLY the
one replica carrying its salt, so the result multiset is identical to
the plain join — for inner and left joins. (right/full are refused:
an unmatched small-side row would surface once per replica.)

The salt is content-derived — a hash of ``spread_col`` when provided,
else of the whole large row — so retries and repartitions never
re-deal a row's salt.

Reference analog: the salted two-phase uniqueness aggregation
(operators/uniqueness.py) — same trick, join form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__join_salt"


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
    spread_col: str | None = None,
) -> DataFrame:
    """Equi-join ``large`` with ``small`` on ``on``, immune to hot
    keys on the large side. The salt must vary WITHIN a key (salting
    by key alone would put the whole hot key back on one reducer), so
    it hashes ``spread_col`` when given (any roughly-unique large-side
    column, e.g. an event id — cheapest and most uniform) and the
    entire large row otherwise (duplicate rows share a salt; still
    uniform for distinct rows).

    Result is identical to ``large.join(small, on, how)`` for
    ``how`` in {'inner', 'left'}.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports inner/left, got {how!r}: an unmatched "
            "small-side row would appear once per replica"
        )
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    overlap = (set(large.columns) & set(small.columns)) - set(on)
    if overlap:
        raise ValueError(f"ambiguous non-key columns on both sides: {sorted(overlap)}")
    spread = (
        [F.col(spread_col)]
        if spread_col
        else [F.col(c) for c in large.columns]
    )
    salt = F.pmod(F.xxhash64(*spread, F.lit("salted-join-v1")), F.lit(n_salts))
    l_salted = large.withColumn(_SALT, salt.cast("int"))
    # lit(int) is already IntegerType; explode cannot be nested inside
    # a cast expression
    replicas = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    s_replicated = small.withColumn(_SALT, replicas)
    return l_salted.join(s_replicated, [*on, _SALT], how).drop(_SALT)
