"""Regenerate the golden-file oracles for queries whose semantics are
deterministic but not expressible in DuckDB SQL:

- ``ivf_topk_embeddings``: the seeded k-means coarse quantizer (uniform
  md5-hash training sample, Lloyd iterations) is deterministic but not
  DuckDB-reproducible.
- ``multimodal_features``: the media "decode" is a declared stub with a
  deterministic fake path (seeded synthesize_media) — there is no input
  table for DuckDB to recompute from.

Both queries are bit-deterministic (seeded sampling ordered by content
hash, per-row float math only — no accumulation-order nondeterminism),
so an exact golden parquet at the driver's correctness scale (sf0.01)
is a valid oracle: oracle_sql() reads it back with read_parquet and the
driver's rows+schema+value-hash compare applies unchanged.

Run after any change to the underlying operators:
    python tools/make_goldens.py
then re-verify with tools/check_contract.py and commit the parquet.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GOLDEN_DIR = REPO / "tests" / "golden"
SF_DIR = "/root/testdata/sf0.01"
GOLDEN_QUERIES = (
    "ivf_topk_embeddings",
    "multimodal_features",
    "pq_topk_embeddings",
    "kmeans_embeddings",
    "semdedup_embeddings",
    "compress_ratio_docs",
    "compress_profile_docs",
)


def main() -> None:
    import __spark_entry__ as entry_mod
    from htm_streamer_spark.session import get_spark

    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="make-goldens", cores=8)
    qs = entry_mod.queries()
    names = sys.argv[1:] or GOLDEN_QUERIES
    for name in names:
        pdf = qs[name](spark, SF_DIR).toPandas()
        out = GOLDEN_DIR / f"{name}.sf0.01.parquet"
        pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), out)
        print(f"{name}: {len(pdf)} rows -> {out}")
    spark.stop()


if __name__ == "__main__":
    main()
