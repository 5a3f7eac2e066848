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


def dedup_ingest_batch_writer(
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    use_bloom: bool = False,
    bloom_m_bits: int = 1 << 23,
    bloom_k: int = 7,
) -> Callable[[DataFrame, int], None]:
    """A ``foreachBatch`` function implementing the production corpus-
    ingest shape: each micro-batch dedups AGAINST THE GROWING STORE
    (:func:`functions.dedup.dedup_against`) and appends only the novel
    documents, with their fingerprint PERSISTED so

    * the next batch's anti join consumes the stored ``__fp__`` column
      as-is (``seen_fingerprint_col`` — one pruned column off the store,
      no re-hash; bucket the store by it on a real deployment and the
      store side of the join never shuffles), and
    * a REPLAYED batch (failure between write and checkpoint commit) is
      idempotent-by-construction: its documents are already in the store,
      so the anti join drops every one and the append writes zero rows —
      exactly-once effect without a transactional table format. The one
      non-atomicity left is a crash MID-append (parquet is not
      transactional here); that is the documented seam where a real
      deployment swaps in a Delta/Iceberg transactional append, same as
      the MERGE INTO seam above.

    The store holds ``(id_col, text_col, __fp__)``. NULL-text rows are
    DROPPED at ingest (same rationale as chunking's empty-doc contract:
    nothing to train on) — and necessarily so for the idempotence claim:
    a NULL text fingerprints to NULL, which the anti join's ``=`` can
    never match, so storing such a row would re-append it on every
    replay, silently violating the store's dedup invariant.

    ``use_bloom`` adds the broadcast membership pre-filter
    (:func:`functions.dedup.dedup_against_bloom`): each batch probes a
    driver-held Bloom filter, only hits reach the store anti join, and
    the batch's own (novel) fingerprints are merged into the filter —
    monotone OR, no store re-scan. The filter is SESSION state: a
    restart rebuilds it from the store once, then it stays covering.
    Ordering is crash-safe: the merge happens BEFORE the append, so a
    failure between the two leaves the filter over-covering — extra
    false positives route through the exact verify join and the retried
    batch still appends correctly. (The reverse order would leave the
    filter missing appended rows, and a Bloom MISS skips verification —
    a silent duplicate on replay.)
    """
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.dedup import (
        build_fingerprint_bloom,
        dedup_against,
        dedup_against_bloom,
        exact_dedup,
        merge_blooms,
    )
    from hbsir_old_spark.functions.text import doc_fingerprint

    bloom_state: dict = {"bloom": None}

    def write(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch.sparkSession
        try:
            seen = spark.read.parquet(store_dir)
            have_store = True
        except AnalysisException as exc:
            # ONLY first-batch conditions count as "no store yet":
            # missing path, or an existing-but-empty checkpointless dir.
            # Anything else (corrupt footers, permissions, transient
            # object-store failures) must FAIL the batch so the streaming
            # checkpoint retries it — swallowing it would ingest the
            # batch with in-batch dedup only and permanently duplicate
            # every already-stored document it contains.
            msg = str(exc)
            if "PATH_NOT_FOUND" not in msg and "UNABLE_TO_INFER_SCHEMA" not in msg:
                raise
            have_store = False
        tagged = batch.select(id_col, text_col).filter(
            F.col(text_col).isNotNull()
        )
        if have_store:
            if use_bloom:
                if bloom_state["bloom"] is None:
                    # session warmup: one store scan makes the filter
                    # covering; every later batch maintains it by merge
                    bloom_state["bloom"] = build_fingerprint_bloom(
                        seen,
                        seen_fingerprint_col="__fp__",
                        m_bits=bloom_m_bits,
                        k=bloom_k,
                    )
                fresh = dedup_against_bloom(
                    tagged, seen, bloom=bloom_state["bloom"],
                    text_col=text_col, id_col=id_col,
                    seen_fingerprint_col="__fp__", keep_fingerprint_col="__fp__",
                )
            else:
                fresh = dedup_against(
                    tagged, seen, text_col=text_col, id_col=id_col,
                    seen_fingerprint_col="__fp__", keep_fingerprint_col="__fp__",
                )
        else:
            fresh = exact_dedup(
                tagged.withColumn("__fp__", doc_fingerprint(text_col)),
                text_col=text_col, id_col=id_col, fingerprint_col="__fp__",
            )
        if use_bloom:
            # pin the novel slice once: the bloom build below and the
            # append would otherwise each re-execute the dedup plan
            fresh = fresh.localCheckpoint(eager=True)
            batch_bloom = build_fingerprint_bloom(
                fresh,
                seen_fingerprint_col="__fp__",
                m_bits=bloom_m_bits,
                k=bloom_k,
            )
            bloom_state["bloom"] = (
                batch_bloom
                if bloom_state["bloom"] is None
                else merge_blooms(bloom_state["bloom"], batch_bloom)
            )
        fresh.write.mode("append").parquet(store_dir)

    return write


def run_dedup_ingest(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    use_bloom: bool = False,
    bloom_m_bits: int = 1 << 23,
    bloom_k: int = 7,
):
    """Wire a streaming document source into the dedup-ingest sink:
    ``readStream -> foreachBatch(dedup against store, append novel)``.
    ``availableNow`` drains-and-stops for tests/backfills. ``use_bloom``
    turns on the broadcast membership pre-filter (see
    :func:`dedup_ingest_batch_writer`); size ``bloom_m_bits`` >= 10x the
    expected store cardinality or the saturated filter routes everything
    through the verify join."""
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            dedup_ingest_batch_writer(
                store_dir,
                text_col=text_col,
                id_col=id_col,
                use_bloom=use_bloom,
                bloom_m_bits=bloom_m_bits,
                bloom_k=bloom_k,
            )
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
