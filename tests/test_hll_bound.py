"""Pin the HLL approximation error of the one permanently rows-only
driver query (``approx_distinct_docs``): ``approx_count_distinct(col,
rsd=0.02)`` must land within 3·rsd of the exact ``countDistinct`` on
sf0.01 documents, per lang group, for BOTH grouped columns. This is
the in-repo correctness bound standing in for the driver's hash gate
(HLL sketch values are engine-specific, so no DuckDB oracle exists).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF001_DIR", "/root/testdata/sf0.01")

RSD = 0.02
BOUND = 3 * RSD  # 3 standard deviations of the sketch's relative error


@pytest.mark.skipif(
    not os.path.exists(f"{SF_DIR}/documents.parquet"), reason="driver testdata absent"
)
def test_hll_within_3_rsd_of_exact(spark):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = (
        d.groupBy("lang")
        .agg(
            F.approx_count_distinct("doc_id", RSD).alias("approx_docs"),
            F.countDistinct("doc_id").alias("exact_docs"),
            F.approx_count_distinct("source", RSD).alias("approx_sources"),
            F.countDistinct("source").alias("exact_sources"),
        )
        .collect()
    )
    assert rows, "no lang groups in sf0.01 documents"
    for r in rows:
        for approx, exact, col in (
            (r["approx_docs"], r["exact_docs"], "doc_id"),
            (r["approx_sources"], r["exact_sources"], "source"),
        ):
            assert exact > 0
            rel = abs(approx - exact) / exact
            assert rel <= BOUND, (
                f"lang={r['lang']} col={col}: approx={approx} exact={exact} "
                f"rel_err={rel:.4f} > {BOUND}"
            )
