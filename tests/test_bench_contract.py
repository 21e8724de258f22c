"""bench.py must keep printing ONE parseable JSON line with the driver's
expected keys — a broken bench means no BENCH_r{N} for the round."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_bench_emits_driver_contract_json():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_SEQ_SHAPE="4x500",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    res = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf", "validated_seqs_per_sec"):
        assert key in res, key
    assert res["unit"] == "sec" and res["value"] > 0
    assert res["sf"] == 0.001
    assert "seq_validate" in res["queries"]
