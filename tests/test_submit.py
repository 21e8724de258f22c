"""Deployability: the north rule's `spark-submit --py-files` path must
actually work — zip the package, submit cli.py against a generated
table in a FRESH process (no repo on PYTHONPATH), check verdicts land
in the checkpoint."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(tmp_path, tiny_dir):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    zip_path = tmp_path / "htm_streamer_spark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for p in (REPO / "htm_streamer_spark").rglob("*.py"):
            z.write(p, p.relative_to(REPO))

    ckpt = tmp_path / "ckpt"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be self-sufficient
    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", str(zip_path),
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            str(REPO / "htm_streamer_spark" / "cli.py"),
            "validate",
            "--table", tiny_dir,
            "--checkpoint", str(ckpt),
            "--max-partitions", "6",
            "--repartition", "8",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo — imports must come from the zip
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["validated"] == [0, 1, 2, 3, 4, 5]
    assert summary["mode"] == "sampling+initializing"
    # verdicts actually committed
    assert (ckpt / "manifest.json").exists()
    manifest = json.loads((ckpt / "manifest.json").read_text())
    assert any(e["table"] == "verdicts" for e in manifest["entries"])
