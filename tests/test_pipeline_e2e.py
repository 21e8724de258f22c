"""End-to-end ingest pipeline integration: JSONL landing → streaming
read with corrupt-record capture → bounded-state cross-batch dedup →
one-pass constraint audit → write-audit-publish into the catalog,
with the final table proven equal to the expected content via the
cross-engine table digest.

Every stage is an operator this repo ships individually; this test
pins that they COMPOSE — the "validate pre-tokenized sequences before
they enter the training table" workflow end to end:

- malformed lines land in a dead-letter stream, never crash the job
  (record_io's PERMISSIVE contract, here on readStream);
- a doc_id re-sent in a later micro-batch is dropped by
  dropDuplicatesWithinWatermark state (streaming/windows.py), while
  a NEW doc_id flows through;
- a micro-batch violating the constraint spec is staged, audited,
  and ABORTED — its rows never become visible, its files are
  gc_orphans fodder (sources/wap.py);
- committed content is verified by operators/checksum.py table_digest
  equality against the directly-constructed expected frame — the
  order/layout-independent comparison the digest exists for.
"""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from htm_streamer_spark.operators.checksum import table_digest
from htm_streamer_spark.sources.table_io import ManifestCatalog
from htm_streamer_spark.sources.wap import audit_spec, write_audit_publish
from htm_streamer_spark.streaming.windows import streaming_dedup

SCHEMA = (
    "doc_id long, n_tok int, source string, ts timestamp, "
    "_corrupt_record string"
)
SPEC = [
    {"column": "doc_id", "kind": "not_null"},
    {"column": "n_tok", "kind": "min_bound", "value": 0.0},
    {"column": "n_tok", "kind": "max_bound", "value": 1000.0},
    {"column": "source", "kind": "in_domain", "values": ["web", "books"]},
]


def _line(doc_id, n_tok, source, minute):
    return json.dumps(
        {
            "doc_id": doc_id,
            "n_tok": n_tok,
            "source": source,
            "ts": f"2024-05-01T10:{minute:02d}:00.000Z",
        }
    )


def _write_batches(land):
    """Three landing files: good, good-with-cross-batch-dups, bad."""
    b1 = [_line(i, 10 + i, "web", 1) for i in range(20)]
    b1.insert(5, "{this is not json")  # dead-letter line 1
    b1.insert(11, '{"doc_id": broken}')  # dead-letter line 2
    # batch 2: 10 new docs + 3 re-sends of batch-1 ids (dup payloads
    # differ so survival is observable)
    b2 = [_line(100 + i, 5, "books", 2) for i in range(10)]
    b2 += [_line(i, 999, "web", 3) for i in (0, 1, 2)]
    # batch 3: parses fine, violates the spec (negative n_tok + bad
    # source) — must be rejected whole by the audit
    b3 = [_line(200 + i, -5, "pirate", 4) for i in range(5)]
    for name, lines in (("b1.json", b1), ("b2.json", b2), ("b3.json", b3)):
        (land / name).write_text("\n".join(lines) + "\n")
        time.sleep(0.05)  # distinct mtimes → file-source batch order


def test_jsonl_to_catalog_pipeline(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    _write_batches(land)
    cat = ManifestCatalog(tmp_path / "catalog")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("maxFilesPerTrigger", 1)
        .json(str(land))
    )
    good = stream.filter(F.col("_corrupt_record").isNull()).drop(
        "_corrupt_record"
    )
    deduped = streaming_dedup(good, ["doc_id"], ts_col="ts", watermark="1 hour")

    dead_letters: list[str] = []
    audits: list[tuple[int, bool, dict]] = []

    def ingest(batch_df, batch_id):
        batch_df = batch_df.persist()
        if batch_df.count():
            published, version, details = write_audit_publish(
                spark, cat, "sequences", batch_df, audit_spec(SPEC)
            )
            audits.append((batch_id, published, details))
        batch_df.unpersist()

    q = deduped.writeStream.foreachBatch(ingest).start()

    # SPARK-21610: a query may not reference ONLY the corrupt column
    # of a raw scan — carry doc_id alongside (it is null for corrupt
    # rows; the point is the plan touches a data column)
    dlq = (
        stream.select("doc_id", "_corrupt_record")
        .filter(F.col("_corrupt_record").isNotNull())
        .writeStream.foreachBatch(
            lambda bdf, bid: dead_letters.extend(
                r["_corrupt_record"] for r in bdf.collect()
            )
        )
        .start()
    )
    q.processAllAvailable()
    dlq.processAllAvailable()
    q.stop()
    dlq.stop()

    # dead letters: exactly the two malformed lines, rows never lost
    assert len(dead_letters) == 2
    assert any("not json" in s for s in dead_letters)

    # audit trail: good batches published, the bad batch rejected with
    # the violated constraints named
    published = [a for a in audits if a[1]]
    rejected = [a for a in audits if not a[1]]
    assert len(published) == 2 and len(rejected) == 1
    assert rejected[0][2] == {"n_tok.min_bound": 5, "source.in_domain": 5}

    # visible state: batches 1+2 minus cross-batch dups; the re-sent
    # doc_ids kept their FIRST-arrival payload (n_tok != 999)
    final = cat.read(spark, "sequences")
    assert final.count() == 30
    assert final.filter(F.col("n_tok") == 999).count() == 0
    assert final.filter(F.col("source") == "pirate").count() == 0

    # content equality via the digest: committed table == the expected
    # frame built directly (order/layout-independent)
    expected = spark.createDataFrame(
        [(i, 10 + i, "web", "2024-05-01 10:01:00") for i in range(20)]
        + [(100 + i, 5, "books", "2024-05-01 10:02:00") for i in range(10)],
        "doc_id long, n_tok int, source string, ts_s string",
    ).select(
        "doc_id", "n_tok", "source", F.col("ts_s").cast("timestamp").alias("ts")
    )
    cols = ["doc_id", "n_tok", "source"]
    assert (
        table_digest(final, cols).collect()
        == table_digest(expected, cols).collect()
    )

    # the rejected batch's files are orphans; GC reclaims them and the
    # visible state is untouched
    reclaimed = cat.gc_orphans()
    assert len(reclaimed) >= 1
    assert cat.read(spark, "sequences").count() == 30

    # lineage: the last commit's props carry the audit report
    assert json.loads(cat.prop("wap_audit"))["passed"] is True
