"""Write-Audit-Publish: data becomes visible ONLY if it passes its
constraint audit.

The north-star workflow — "validate pre-tokenized sequences before
they enter the training table" — is exactly the WAP pattern Iceberg
popularized (stage a snapshot on a branch, audit it, fast-forward on
pass). The ManifestCatalog already gives the two halves: staged files
are on disk but invisible until ``commit()``, and ``abort()`` +
``gc_orphans()`` reclaim a rejected batch. This module is the
composition:

1. **write** — stage the batch (optionally with manifest column stats
   for later pruned reads);
2. **audit** — run the check over the STAGED files themselves (what
   was actually serialized — a re-audit of the input DataFrame would
   miss writer bugs and non-determinism);
3. **publish** — commit (audit report embedded in the commit props)
   or abort, in which case the table's visible state is untouched and
   the orphaned files are GC-fodder.

Audits are any callable df -> (passed, details). ``audit_spec`` wraps
the one-pass constraint-spec checker from operators/suggestions.py —
suggest the spec once from a healthy sample, then every ingest batch
pays ONE aggregation to be admitted.

Scale notes: the audit reads only the staged batch (delta-sized, not
the table); the constraint pass is a single combinable aggregation;
publish/abort are manifest-file metadata operations.

Reference analog: the reference validates AFTER ingestion, flagging
rows already inside (/root/reference/htm_streamer/validation.py);
WAP moves the same checks in front of visibility, which is the only
ordering that scales to consumers you don't control.
"""

from __future__ import annotations

import json
from typing import Callable, Tuple

from pyspark.sql import DataFrame, SparkSession

from htm_streamer_spark.sources.table_io import ManifestCatalog

__all__ = ["write_audit_publish", "audit_spec"]

AuditFn = Callable[[DataFrame], Tuple[bool, dict]]


def audit_spec(spec: list[dict]) -> AuditFn:
    """Audit = the one-pass constraint spec check; fails if ANY
    constraint reports violations."""

    def run(df: DataFrame) -> Tuple[bool, dict]:
        from htm_streamer_spark.operators.suggestions import check_constraints

        rows = check_constraints(df, spec).collect()
        details = {
            r["constraint_id"]: int(r["n_violations"])
            for r in rows
            if not r["passed"]
        }
        return (not details), details

    return run


def write_audit_publish(
    spark: SparkSession,
    cat: ManifestCatalog,
    table: str,
    df: DataFrame,
    audit: AuditFn,
    stats_cols: tuple[str, ...] | None = None,
    props: dict | None = None,
) -> Tuple[bool, int | None, dict]:
    """Stage ``df``, audit the staged files, publish on pass.

    Returns (published, version, details): version is the new manifest
    version on publish, None on reject. The audit outcome rides in the
    commit props (``wap_audit``) so lineage shows WHICH checks admitted
    each version. On reject the staged files are abandoned via
    ``abort()`` — invisible to every reader, reclaimable by
    ``gc_orphans``."""
    cat.stage_spark(table, df, stats_cols=stats_cols)
    staged = [str(cat.root / e["file"]) for e in cat._staged if e["table"] == table]
    staged_df = spark.read.parquet(*staged)
    passed, details = audit(staged_df)
    if not passed:
        cat.abort()
        return False, None, details
    all_props = dict(props or {})
    all_props["wap_audit"] = json.dumps({"passed": True, "details": details})
    version = cat.commit(props=all_props)
    return True, version, details
