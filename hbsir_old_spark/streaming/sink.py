"""Incremental streaming sinks: exactly-once windowed aggregation into a
key-upserted parquet table via ``foreachBatch``.

Beyond-reference streaming surface (the reference is batch-only): the
standard production shape for "keep a continuously-updated aggregate
table" is

    readStream -> watermark -> windowed agg -> foreachBatch(upsert)

``foreachBatch`` hands each micro-batch a normal DataFrame plus a
monotonically increasing epoch id; together with the streaming
checkpoint, re-delivered batches replay with the SAME epoch, so an
idempotent writer gives end-to-end exactly-once. Without a transactional
table format in this environment, upsert = overwrite-matching-partitions
(``partitionOverwriteMode=dynamic``): each batch rewrites only the
key-partitions it touches — at 100 TB that is the partition-pruned
Delta/Iceberg MERGE analogue, and the seam where a real deployment swaps
in ``MERGE INTO``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def upsert_batch_writer(
    target_dir: str,
    partition_cols: list[str],
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function that dynamically overwrites exactly the
    ``partition_cols`` partitions present in the micro-batch. Idempotent:
    replaying a batch rewrites the same partitions with the same rows."""

    def write(batch: DataFrame, epoch_id: int) -> None:
        (
            batch.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(target_dir)
        )

    return write


def run_windowed_upsert(
    stream: DataFrame,
    target_dir: str,
    checkpoint_dir: str,
    partition_cols: list[str],
    trigger_available_now: bool = True,
):
    """Wire a (already-aggregated, update-mode-compatible) streaming
    DataFrame into the upsert sink. ``availableNow`` drains everything
    currently readable then stops — the batch-like test/backfill mode;
    leave it False for a continuously-running query."""
    writer = (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert_batch_writer(target_dir, partition_cols))
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
