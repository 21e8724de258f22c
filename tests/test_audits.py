"""Dedup-quality and metadata-trust audit queries (driver contract)."""

import importlib.util
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_audits", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dedup_recall_precision_invariant(spark, entry_mod):
    # the confirm step exact-verifies every LSH pair over the same
    # shingle space as the ground truth, so precision MUST be 1.0;
    # recall is the S-curve's to lose but must be positive here (the
    # corpus plants near-dup pairs well above the 0.5 threshold)
    row = entry_mod.queries()["dedup_recall_docs"](spark, SF_DIR).collect()[0]
    assert row["n_common"] == row["n_lsh"]
    assert row["precision"] == pytest.approx(1.0, abs=1e-6)
    assert row["n_exact"] > 0
    assert 0 < row["recall"] <= 1.0


def test_lang_confusion_totals(spark, entry_mod):
    out = entry_mod.queries()["lang_confusion_docs"](spark, SF_DIR).toPandas()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert out["n"].sum() == docs.count()  # every doc lands in one cell
    assert set(out["lang_pred"]) <= {"de", "en", "es", "fr"}
