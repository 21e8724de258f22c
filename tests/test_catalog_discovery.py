"""Partition discovery must be a filesystem listing, not a table scan;
Iceberg binding smoke-tests (skip cleanly when the jar is absent)."""

from __future__ import annotations

import os

import pytest

from htm_streamer_spark.sources.table_io import (
    IcebergCatalog,
    iceberg_available,
    list_hive_partitions,
)


def test_listing_matches_layout(spark, tiny_dir):
    got = list_hive_partitions(spark, tiny_dir)
    assert got == list(range(10))


def test_listing_is_metadata_only_no_scan(spark, tmp_path):
    """An EMPTY part_id directory (no parquet inside) is still
    discovered — a column scan could never see it, proving discovery
    never reads data files."""
    root = tmp_path / "tbl"
    for p in (3, 7, 11):
        (root / f"part_id={p}").mkdir(parents=True)
    assert list_hive_partitions(spark, root) == [3, 7, 11]


def test_listing_non_hive_layout_returns_empty(spark, tmp_path):
    root = tmp_path / "flat"
    root.mkdir()
    (root / "whatever.parquet").write_bytes(b"")
    assert list_hive_partitions(spark, root) == []
    assert list_hive_partitions(spark, tmp_path / "missing") == []


def test_incremental_uses_listing(spark, tiny_dir, cfg, tmp_path, monkeypatch):
    """run_incremental discovers partitions via the listing (the scan is
    only the non-hive fallback)."""
    from htm_streamer_spark.sources.table_io import ManifestCatalog
    from htm_streamer_spark.streaming import incremental

    calls = {"n": 0}
    orig = incremental.list_hive_partitions

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(incremental, "list_hive_partitions", spy)
    out = incremental.run_incremental(
        spark, tiny_dir, ManifestCatalog(tmp_path / "c"), cfg, max_partitions=4
    )
    assert calls["n"] == 1
    assert out["validated"] == [0, 1, 2, 3]


ICEBERG_CATALOG = os.environ.get("SPARK_GRAFT_ICEBERG_CATALOG", "local_iceberg")


def test_iceberg_binding_roundtrip(spark, tmp_path):
    """Full catalog-interface roundtrip over real Iceberg tables. Skips
    cleanly when the iceberg-spark-runtime jar / catalog conf is absent
    (SURVEY.md §7.3.6 — not shipped in this sandbox)."""
    if not iceberg_available(spark, ICEBERG_CATALOG):
        pytest.skip("iceberg runtime/catalog not configured")
    cat = IcebergCatalog(spark, ICEBERG_CATALOG, "htm_streamer_test")
    cat.truncate()
    df = spark.range(3).selectExpr(
        "'r1' AS run_id", "CAST(id AS INT) AS part_id", "'pass' AS status",
        "'{}' AS metrics", "0.0 AS committed_at"
    )
    cat.stage_spark("verdicts", df)
    v1 = cat.commit({"baseline_part_ids": "[0,1]"})
    assert v1 == 1
    assert cat.read(spark, "verdicts").count() == 3
    assert cat.prop("baseline_part_ids") == "[0,1]"
    cat.stage_spark("verdicts", df)
    assert cat.commit() == 2
    assert cat.read(spark, "verdicts").count() == 6
    cat.truncate()


def test_iceberg_constructor_raises_without_runtime(spark):
    if iceberg_available(spark, "definitely_not_configured_catalog"):
        pytest.skip("unexpectedly configured")
    with pytest.raises(RuntimeError, match="Iceberg"):
        IcebergCatalog(spark, "definitely_not_configured_catalog", "ns")


def test_iceberg_commit_orders_verdicts_last(monkeypatch):
    """The lineage anchor (verdicts) must commit LAST so a crash
    mid-commit can orphan auxiliary rows but never mark a partition
    validated without them. Exercised with stubs since the Iceberg jar
    is absent in CI."""
    from htm_streamer_spark.sources import table_io

    events = []

    class FakeWriter:
        def __init__(self, table):
            self.table = table

        def append(self):
            events.append(("append", self.table))

        def using(self, fmt):
            return self

        def create(self):
            events.append(("create", self.table))

    class FakeDF:
        def __init__(self, name):
            self.name = name

        def writeTo(self, fqn):
            return FakeWriter(fqn)

    class FakeCatalogAPI:
        def tableExists(self, fqn):
            return "verdicts" in fqn  # verdicts exists, others don't

    class FakeSpark:
        catalog = FakeCatalogAPI()

        def sql(self, q):
            events.append(("sql", q.split("(")[0].strip()))

            class R:
                @staticmethod
                def collect():
                    return [[1]]

            return R()

    monkeypatch.setattr(table_io, "iceberg_available", lambda *a: True)
    cat = table_io.IcebergCatalog(FakeSpark(), "ice", "ns")
    # stage out of order on purpose
    cat.stage_spark("verdicts", FakeDF("verdicts"))
    cat.stage_spark("violations", FakeDF("violations"))
    cat.stage_spark("baseline_tok", FakeDF("baseline_tok"))
    cat.commit({"k": "v"})

    writes = [e for e in events if e[0] in ("append", "create")]
    assert writes[-1] == ("append", "ice.ns.verdicts")  # anchor last
    assert ("create", "ice.ns.violations") in writes
    assert ("create", "ice.ns.baseline_tok") in writes
    # props go on the verdicts table
    assert any("ALTER TABLE ice.ns.verdicts SET TBLPROPERTIES" in e[1] for e in events if e[0] == "sql")
    assert cat._staged == []


def test_iceberg_props_escape_quotes(monkeypatch):
    """ADVICE regression: prop values carry JSON — a single quote must
    not break the TBLPROPERTIES SQL."""
    from htm_streamer_spark.sources import table_io

    sqls = []

    class FakeCatalogAPI:
        def tableExists(self, fqn):
            return True

    class FakeSpark:
        catalog = FakeCatalogAPI()

        def sql(self, q):
            sqls.append(q)

            class R:
                @staticmethod
                def collect():
                    return [[1]]

            return R()

    monkeypatch.setattr(table_io, "iceberg_available", lambda *a: True)
    cat = table_io.IcebergCatalog(FakeSpark(), "ice", "ns")
    cat.commit({"note": "it's {\"a\": 'quoted'}"})
    alter = [q for q in sqls if "TBLPROPERTIES" in q][0]
    assert "it''s" in alter and "''quoted''" in alter
    # the raw single quote never appears unescaped inside the value
    assert "'it's" not in alter


def test_iceberg_props_without_anchor_raise(monkeypatch):
    """Silently dropping props would lose last_committed_epoch and
    defeat the streaming replay guard — commit must fail loudly when
    the anchor table is missing."""
    from htm_streamer_spark.sources import table_io

    class FakeCatalogAPI:
        def tableExists(self, fqn):
            return False

    class FakeSpark:
        catalog = FakeCatalogAPI()

        def sql(self, q):
            class R:
                @staticmethod
                def collect():
                    return [[0]]

            return R()

    monkeypatch.setattr(table_io, "iceberg_available", lambda *a: True)
    cat = table_io.IcebergCatalog(FakeSpark(), "ice", "ns")
    with pytest.raises(RuntimeError, match="does not exist"):
        cat.commit({"last_committed_epoch": "4"})


# ---------------------------------------------------------------------------
# ManifestCatalog crash-recovery (VERDICT r2 item 7)
# ---------------------------------------------------------------------------


def _snapshot(spark, cat):
    from htm_streamer_spark.sources.table_io import ManifestCatalog

    reader = ManifestCatalog(cat.root)  # fresh handle, like a new process
    df = reader.read(spark, "verdicts")
    return sorted(map(tuple, df.collect())) if df is not None else None


def test_crash_between_stage_and_commit_is_invisible(spark, tmp_path):
    """Kill after stage_spark but before commit: a fresh reader (new
    process) sees the previous snapshot; re-staging + committing from
    the new process publishes exactly once."""
    from htm_streamer_spark.sources.table_io import ManifestCatalog

    cat = ManifestCatalog(tmp_path / "crash1")
    df1 = spark.range(2).selectExpr("CAST(id AS INT) part_id", "'pass' status")
    cat.stage_spark("verdicts", df1)
    cat.commit()
    before = _snapshot(spark, cat)

    # "crash": stage new files, never commit, process dies
    df2 = spark.range(2, 5).selectExpr("CAST(id AS INT) part_id", "'fail' status")
    cat.stage_spark("verdicts", df2)
    del cat  # staged list dies with the process

    cat2 = ManifestCatalog(tmp_path / "crash1")
    assert _snapshot(spark, cat2) == before  # staged-only files invisible
    # recovery: redo the work and commit
    cat2.stage_spark("verdicts", df2)
    cat2.commit()
    after = _snapshot(spark, cat2)
    assert len(after) == 5 and len([r for r in after if r[1] == "fail"]) == 3


def test_crash_mid_manifest_swap_keeps_old_snapshot(spark, tmp_path):
    """Kill between writing manifest.json.tmp and os.replace: the tmp
    file is garbage-in-progress, the live manifest is untouched, and the
    next commit overwrites the tmp cleanly."""
    import json

    from htm_streamer_spark.sources.table_io import ManifestCatalog

    cat = ManifestCatalog(tmp_path / "crash2")
    df1 = spark.range(3).selectExpr("CAST(id AS INT) part_id", "'pass' status")
    cat.stage_spark("verdicts", df1)
    cat.commit()
    before = _snapshot(spark, cat)
    version_before = cat.version()

    # simulate the torn write: a half-written tmp next to the manifest
    tmp_file = cat._manifest_path.with_suffix(".json.tmp")
    tmp_file.write_text('{"version": 999, "entries": [{"tab')  # truncated

    cat2 = ManifestCatalog(tmp_path / "crash2")
    assert cat2.version() == version_before
    assert _snapshot(spark, cat2) == before

    # next commit replaces the torn tmp and publishes atomically
    cat2.stage_spark("verdicts", spark.range(3, 4).selectExpr(
        "CAST(id AS INT) part_id", "'fail' status"))
    cat2.commit()
    assert cat2.version() == version_before + 1
    assert len(_snapshot(spark, cat2)) == 4
    # the manifest on disk is valid JSON (the torn tmp never leaked in)
    json.loads(cat2._manifest_path.read_text())


def test_commit_is_all_or_nothing_across_tables(spark, tmp_path):
    """One commit staging verdicts + violations + baseline publishes all
    three atomically: before the manifest swap a fresh reader sees none
    of them, after it sees all (the multi-table transaction semantics
    the Iceberg binding approximates with commit ordering)."""
    from htm_streamer_spark.sources.table_io import ManifestCatalog

    cat = ManifestCatalog(tmp_path / "crash3")
    cat.stage_spark("verdicts", spark.range(2).selectExpr("CAST(id AS INT) part_id"))
    cat.stage_spark("violations", spark.range(5).selectExpr("CAST(id AS INT) doc_id"))
    cat.stage_spark("baseline_tok", spark.range(3).selectExpr("CAST(id AS INT) bucket"))

    fresh = ManifestCatalog(tmp_path / "crash3")
    assert all(
        fresh.read(spark, t) is None for t in ("verdicts", "violations", "baseline_tok")
    )
    cat.commit()
    fresh2 = ManifestCatalog(tmp_path / "crash3")
    assert fresh2.read(spark, "verdicts").count() == 2
    assert fresh2.read(spark, "violations").count() == 5
    assert fresh2.read(spark, "baseline_tok").count() == 3
