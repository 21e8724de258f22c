"""Golden-parquet oracles stay bit-identical to the live queries.

These goldens (tools/make_goldens.py) are the driver-gate oracle for
queries that are deterministic but not DuckDB-recomputable; if an
operator change legitimately alters the output, regenerate the golden
and commit it — this test is the tripwire against silent drift or
nondeterminism (partition-layout- or sample-order-dependence would show
up here as a flaky mismatch).
"""

from __future__ import annotations

import importlib.util as iu
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parents[1]
GOLDEN_DIR = REPO / "tests" / "golden"
SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entry_mod():
    spec = iu.spec_from_file_location("spark_entry_goldens", REPO / "__spark_entry__.py")
    mod = iu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize(
    "name",
    [
        "ivf_topk_embeddings",
        "multimodal_features",
        "pq_topk_embeddings",
        "kmeans_embeddings",
        "semdedup_embeddings",
    ],
)
def test_golden_matches_live_query(spark, entry_mod, name):
    got = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    want = pd.read_parquet(GOLDEN_DIR / f"{name}.sf0.01.parquet")
    key = sorted(got.columns)
    got = got[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    want = want[key].sort_values(key, kind="mergesort").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
