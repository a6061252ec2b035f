"""Structured Streaming sink writing micro-batches into lake tables.

The read side (:mod:`cdc_source`) streams a table's change feed out;
this is the write side: ``foreachBatch`` routed into the lake's
transactional insert path, so every micro-batch is one snapshot —
atomic, time-travelable, CDC-visible downstream. Combined, the two
give end-to-end incremental pipelines between lake tables
(bronze -> silver -> gold) with exactly-once-per-batch semantics:
replayed batches are detected via the batch id recorded in the
snapshot's commit message and skipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream(
    stream_df: DataFrame,
    lake,
    table: str,
    *,
    checkpoint: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Start a streaming query appending micro-batches to ``table``.

    Each batch commits as one lake snapshot tagged
    ``streaming_batch:<epoch_id>``; on restart after a failure between
    data-commit and checkpoint-advance, the replayed epoch is detected
    from the snapshot log and skipped (insert-side idempotence).
    """

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        tag = f"streaming_batch:{table}:{epoch_id}"
        seen = lake.meta.query(
            "SELECT 1 FROM ducklake_snapshot_changes WHERE commit_message = ? LIMIT 1",
            (tag,),
        )
        if seen:
            return
        lake.set_commit_message("streaming", tag)
        lake.insert(table, batch_df)

    writer = stream_df.writeStream.foreachBatch(commit_batch).option(
        "checkpointLocation", checkpoint
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
