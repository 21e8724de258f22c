"""Write-Audit-Publish (sources/wap.py): bad batches never become
visible, good ones carry their audit in the commit props, rejects are
GC-reclaimable."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from htm_streamer_spark.sources.table_io import ManifestCatalog
from htm_streamer_spark.sources.wap import audit_spec, write_audit_publish

SPEC = [
    {"column": "n_tok", "kind": "not_null"},
    {"column": "n_tok", "kind": "min_bound", "value": 1},
    {"column": "n_tok", "kind": "max_bound", "value": 100},
]


def _batch(spark, toks):
    return spark.createDataFrame(
        [(f"d{i}", t) for i, t in enumerate(toks)], "doc_id string, n_tok int"
    )


def test_good_batch_publishes_with_audit_props(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    ok, version, details = write_audit_publish(
        spark, cat, "seq", _batch(spark, [5, 50, 99]), audit_spec(SPEC),
        stats_cols=("n_tok",),
    )
    assert ok and version == 1 and details == {}
    assert cat.read(spark, "seq").count() == 3
    audit = json.loads(cat.prop("wap_audit"))
    assert audit["passed"] is True
    # stats_cols flowed through: pruned read works on the published data
    df, rep = cat.read_pruned(spark, "seq", "n_tok", lo=60, hi=200)
    assert rep["files_total"] >= 1 and df.count() == 1


def test_bad_batch_stays_invisible_and_gc_reclaims(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    write_audit_publish(
        spark, cat, "seq", _batch(spark, [5, 50]), audit_spec(SPEC)
    )
    v1 = cat.version()
    ok, version, details = write_audit_publish(
        spark, cat, "seq", _batch(spark, [5, None, 4000]), audit_spec(SPEC)
    )
    assert not ok and version is None
    assert details == {"n_tok.not_null": 1, "n_tok.max_bound": 1}
    # table state untouched
    assert cat.version() == v1
    assert cat.read(spark, "seq").count() == 2
    # the rejected files are orphans; gc removes them
    removed = cat.gc_orphans()
    assert removed
    assert cat.read(spark, "seq").count() == 2


def test_good_bad_good_sequence(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    audit = audit_spec(SPEC)
    assert write_audit_publish(spark, cat, "seq", _batch(spark, [1, 2]), audit)[0]
    assert not write_audit_publish(spark, cat, "seq", _batch(spark, [0]), audit)[0]
    assert write_audit_publish(spark, cat, "seq", _batch(spark, [3]), audit)[0]
    got = sorted(
        r["n_tok"] for r in cat.read(spark, "seq").select("n_tok").collect()
    )
    assert got == [1, 2, 3]
    assert cat.version() == 2


def test_empty_batch_publishes_clean(spark, tmp_path):
    cat = ManifestCatalog(tmp_path / "cat")
    empty = _batch(spark, []).filter(F.lit(False))
    ok, version, details = write_audit_publish(
        spark, cat, "seq", empty, audit_spec(SPEC)
    )
    assert ok and details == {}
