"""Snapshot-committed parquet tables — the engine's state/table layer.

A minimal stand-in for Iceberg (whose runtime jar is unavailable in this
sandbox, SURVEY.md §7.3.6): a directory of parquet files plus a JSON
manifest that lists the committed files per logical table. Readers see
only committed files; writers stage files then publish them with one
atomic manifest swap (``os.replace``), so a crash mid-write leaves the
catalog at the previous snapshot — the write-then-mark ordering the
reference gets from saving models before config
(/root/reference/htm_streamer/pipeline/htm_stream.py:135-155).

At deploy time this binds to Iceberg: ``append`` ≙ ``writeTo(...)
.append()``, ``commit`` ≙ the snapshot commit, ``read`` ≙
``spark.read.format("iceberg").load``; checkpoint semantics are
identical.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class ManifestCatalog:
    """Multi-table catalog under one directory with atomic multi-table
    commits (one manifest swap publishes every staged file — the analog
    of a single Iceberg transaction across the verdicts/violations/
    baseline tables)."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)
        (self.root / "data").mkdir(exist_ok=True)
        self._staged: list[dict] = []

    @property
    def _manifest_path(self) -> Path:
        return self.root / "manifest.json"

    def _manifest(self) -> dict:
        if not self._manifest_path.exists():
            return {"version": 0, "entries": []}
        with open(self._manifest_path) as f:
            return json.load(f)

    # -- write path ---------------------------------------------------

    def stage_spark(self, table: str, df: DataFrame) -> None:
        """Stage a Spark DataFrame as parquet files (not yet visible)."""
        stage_dir = self.root / "data" / f"{table}-{uuid.uuid4().hex}"
        df.write.mode("overwrite").parquet(str(stage_dir))
        for p in sorted(stage_dir.glob("*.parquet")):
            self._staged.append({"table": table, "file": str(p.relative_to(self.root))})

    def stage_rows(self, table: str, rows: list[dict], schema: str, spark: SparkSession) -> None:
        self.stage_spark(table, spark.createDataFrame(rows, schema))

    def commit(self, props: dict | None = None) -> int:
        """Atomically publish all staged files; returns new version."""
        m = self._manifest()
        m["version"] += 1
        for e in self._staged:
            e["version"] = m["version"]
        m["entries"].extend(self._staged)
        if props:
            m.setdefault("props", {}).update(props)
        tmp = self._manifest_path.with_suffix(".json.tmp")
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._manifest_path)
        self._staged = []
        return m["version"]

    def abort(self) -> None:
        self._staged = []

    # -- read path ----------------------------------------------------

    def files(self, table: str, latest_only: bool = False) -> list[str]:
        entries = [e for e in self._manifest()["entries"] if e["table"] == table]
        if latest_only and entries:
            top = max(e.get("version", 0) for e in entries)
            entries = [e for e in entries if e.get("version", 0) == top]
        return [str(self.root / e["file"]) for e in entries]

    def read(
        self, spark: SparkSession, table: str, latest_only: bool = False
    ) -> DataFrame | None:
        """DataFrame over the committed files of ``table`` (None if no
        committed data). ``latest_only`` reads just the files from the
        most recent commit touching the table — latest-wins semantics
        for state tables like the baseline (reference analog: each
        timestep's pickle fully replaces the previous,
        utils/fs.py:92-130)."""
        files = self.files(table, latest_only)
        if not files:
            return None
        return spark.read.parquet(*files)

    def prop(self, key: str, default=None):
        return self._manifest().get("props", {}).get(key, default)

    def version(self) -> int:
        return self._manifest()["version"]

    def truncate(self) -> None:
        """Reset the catalog (reference analog: ``reset_config`` stripping
        run state back to the minimal schema, config/config.py:15-33, and
        the stale-model purge, htm_stream_runner.py:62-64)."""
        if self._manifest_path.exists():
            self._manifest_path.unlink()
        shutil.rmtree(self.root / "data", ignore_errors=True)
        (self.root / "data").mkdir(exist_ok=True)
        self._staged = []
