"""Streaming upsert sink: foreachBatch + copy-on-write MERGE with an
epoch replay guard — the Structured-Streaming twin of table_io.
merge_upsert and the analog of a Delta/Iceberg streaming MERGE sink.

Exactly-once at the table level: each micro-batch's merge commit
carries the (checkpoint identity, epoch id) replay guard IN THE SAME
atomic manifest swap as the data, so the classic failure window —
catalog commit succeeded, Spark checkpoint write did not, micro-batch
replays with the same epoch id — is detected and skipped instead of
double-applied. Same guard-key discipline as streaming/structured.py
(epoch ids are monotone per checkpoint location only; an ephemeral
checkpoint gets a fresh key so a stale guard never swallows batches).
"""

from __future__ import annotations

import uuid
from typing import Callable

from pyspark.sql import DataFrame

from htm_streamer_spark.sources.table_io import ManifestCatalog, merge_upsert


def make_upsert_batch_processor(
    catalog: ManifestCatalog,
    table: str,
    key_cols: list[str],
    order_col: str,
    *,
    n_buckets: int = 16,
    checkpoint_location: str | None = None,
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch callable, exposed for direct testing (replay a
    batch with the same epoch id and observe the no-op)."""
    guard_key = checkpoint_location or f"ephemeral-{uuid.uuid4().hex}"
    gk_prop = f"merge.{table}.epoch_guard_key"
    ep_prop = f"merge.{table}.last_committed_epoch"

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if catalog.prop(gk_prop) == guard_key and int(epoch_id) <= int(
            catalog.prop(ep_prop, "-1")
        ):
            return  # replayed epoch: the merge already committed
        merge_upsert(
            batch_df.sparkSession,
            catalog,
            table,
            batch_df,
            key_cols,
            order_col,
            n_buckets=n_buckets,
            extra_props={gk_prop: guard_key, ep_prop: str(int(epoch_id))},
        )

    return process_batch


def start_streaming_upsert(
    stream_df: DataFrame,
    catalog: ManifestCatalog,
    table: str,
    key_cols: list[str],
    order_col: str,
    *,
    n_buckets: int = 16,
    checkpoint_location: str | None = None,
    available_now: bool = False,
):
    """Start the streaming MERGE: every micro-batch upserts into
    ``catalog``/``table`` (latest-wins on ``order_col``, bucket-pruned
    rewrite). Readers see each micro-batch as one complete snapshot via
    ``catalog.read(spark, table, latest_only=True)``.

    Returns the StreamingQuery."""
    proc = make_upsert_batch_processor(
        catalog,
        table,
        key_cols,
        order_col,
        n_buckets=n_buckets,
        checkpoint_location=checkpoint_location,
    )
    writer = stream_df.writeStream.foreachBatch(proc).outputMode("update")
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_streaming_dedup_ingest(
    stream_df: DataFrame,
    catalog: ManifestCatalog,
    table: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 16,
    checkpoint_location: str | None = None,
    available_now: bool = False,
):
    """Cross-batch exact-dedup ingest: every micro-batch lands in the
    catalog with at most ONE row per content digest across the ENTIRE
    stream history — the canonical row being the smallest ``id_col``
    ever seen for that digest.

    This is first-wins dedup expressed as the existing epoch-guarded
    streaming MERGE: key = md5(text), order = the NEGATED id, so
    "latest wins on order" keeps the minimum id deterministically, a
    later duplicate can never replace the canonical row, and replayed
    micro-batches are no-ops via the same atomic (guard, epoch)
    manifest swap. State is the table itself — no executor-memory
    digest set, so the dedup horizon is unbounded at any corpus size
    (contrast streaming/windows.streaming_dedup, whose in-memory state
    is watermark-bounded by design).

    The committed table carries (digest, ``__neg_id`` order key, and
    the row's columns); read it back with
    ``catalog.read(spark, table, latest_only=True)``.

    Returns the StreamingQuery.
    """
    from pyspark.sql import functions as F

    digested = (
        stream_df.withColumn("digest", F.md5(F.col(text_col)))
        .withColumn("__neg_id", -F.col(id_col))
    )
    return start_streaming_upsert(
        digested,
        catalog,
        table,
        ["digest"],
        "__neg_id",
        n_buckets=n_buckets,
        checkpoint_location=checkpoint_location,
        available_now=available_now,
    )
