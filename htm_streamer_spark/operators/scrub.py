"""Pattern scrubbing: per-document blocklist/PII match accounting and
redaction — the policy-filter step of a training-data pipeline.

The mechanics are exactly those of PII removal (regex match counting +
redacted-text statistics); the test corpus carries no real PII, so the
shipped queries run a term blocklist through the same machinery. Swap
the pattern for an email/phone/SSN alternation in production.

Scale notes: pure codegen'd regexp expressions inside the scan — zero
shuffle for the per-doc frame, no Python anywhere. The regex is a
single alternation compiled once per task; cost is one linear scan of
each text regardless of how many terms the blocklist holds (the same
probe-count-independence argument as operators/contamination.py's
regex variant, contamination.py:140).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocklist_pattern(terms: Sequence[str]) -> str:
    r"""Whole-word alternation ``\b(a|b|c)\b`` — portable across Java
    regex (Spark) and RE2 (DuckDB oracle); terms must be \w-safe."""
    if not terms:
        raise ValueError("terms must be non-empty")
    for t in terms:
        if not t.replace("_", "a").isalnum():
            raise ValueError(f"blocklist term not word-safe: {t!r}")
    return r"\b(" + "|".join(terms) + r")\b"


def scrub_stats(
    df: DataFrame,
    terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document scrub accounting: number of blocklist matches and
    the text length after redacting them (replacement with '').

    Returns (id_col, n_matches, clean_len, flagged)."""
    pat = blocklist_pattern(terms)
    t = F.col(text_col)
    n = F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
    clean = F.length(F.regexp_replace(t, pat, ""))
    return df.select(
        id_col,
        n.cast("long").alias("n_matches"),
        clean.cast("long").alias("clean_len"),
        (n > 0).cast("int").alias("flagged"),
    )
