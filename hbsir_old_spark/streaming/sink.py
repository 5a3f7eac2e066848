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

import json
import os
import re
import uuid
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


# -- manifest-committed store layout -----------------------------------------
#
# The dedup-ingest store is NOT a flat parquet directory: each batch's
# novel rows land in their own data subdirectory, and a single JSON
# manifest names the COMMITTED batch directories. Readers resolve the
# manifest; a data directory a crash left half-written (or fully written
# but never committed) is simply invisible. The commit itself is
# write-temp + fsync + os.replace + directory fsync — an atomic, durable
# rename on POSIX filesystems, which closes the mid-append crash window a
# plain `mode("append")` parquet write leaves open (the r10-documented
# Delta/Iceberg seam, now closed without a table format).
#
# The manifest layer is LOCAL-FILESYSTEM-ONLY: manifest reads/commits use
# driver-local open/os.replace, so a remote store_dir (hdfs://, s3a://,
# ...) would silently read an empty manifest and treat a populated store
# as new. _require_local_store_dir rejects URI-schemed paths up front; a
# remote deployment swaps _read_manifest/_commit_manifest for the Hadoop
# FileSystem API (HDFS rename is atomic too) or a conditional PUT on
# S3-like stores — the same one-function seam as the S6/S11 injectable
# clients.
#
#   store_dir/
#     manifest.json                    {"batches": ["batch-00000000-ab12cd34", ...]}
#     data/batch-<epoch id>-<token>/   one parquet dir per committed batch
#
# SINGLE-WRITER assumption (the standard streaming-sink contract): one
# streaming query owns a store at a time — its checkpoint serializes the
# batches, so the read-manifest/commit-manifest sequence never races.
# Concurrent INDEPENDENT queries appending to one store would need a
# compare-and-swap commit (the conditional-PUT seam above); readers are
# always safe (they see some committed prefix).
#
# Batch data directories are keyed by the foreachBatch EPOCH id plus a
# per-writer random token. The epoch key lets an intra-run retry (same
# writer instance) overwrite its own uncommitted directory instead of
# leaking orphans; the token keeps a RESTARTED query — whose epoch ids
# begin at 0 again under a fresh/replaced checkpoint — from clobbering a
# committed directory of the same epoch number (a review pass caught the
# token-less form losing committed docs exactly that way). A directory
# orphaned by a crash-then-restart stays unreferenced and invisible.


def _require_local_store_dir(store_dir: str) -> None:
    """Reject URI-schemed store paths (``hdfs://``, ``s3a://``, even
    ``file://``) up front. Manifest I/O is driver-local ``open``/
    ``os.replace``; on a remote URI ``_read_manifest`` would return ``[]``
    (a populated store read as empty — the dedup screen silently skipped)
    and the batch would only fail later at the commit. Remote stores plug
    in at the ``_read_manifest``/``_commit_manifest`` seam (Hadoop
    FileSystem API or conditional PUT) — until then, fail loudly here."""
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://", store_dir):
        raise ValueError(
            f"store_dir {store_dir!r} is a URI; the manifest-committed "
            f"store layer is local-filesystem-only (manifest reads/commits "
            f"use driver-local open/os.replace). Pass a plain local path, "
            f"or swap _read_manifest/_commit_manifest for your "
            f"filesystem's atomic-publish primitive."
        )


def _manifest_path(store_dir: str) -> str:
    return os.path.join(store_dir, "manifest.json")


def _read_manifest(store_dir: str) -> list[str]:
    _require_local_store_dir(store_dir)
    try:
        with open(_manifest_path(store_dir)) as f:
            return json.load(f)["batches"]
    except FileNotFoundError:
        return []


def _commit_manifest(store_dir: str, batches: list[str]) -> None:
    """Atomically publish the committed-batch list: write a temp file,
    fsync it (the rename must not outrun its contents on power loss),
    os.replace onto manifest.json — readers see the old or the new
    manifest, never a torn one — then fsync the store DIRECTORY so the
    rename itself is durable (without it, power loss could persist the
    later streaming-checkpoint commit but not this rename, marking the
    batch done while its novel docs never entered the store)."""
    _require_local_store_dir(store_dir)
    path = _manifest_path(store_dir)
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump({"batches": batches}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    dir_fd = os.open(store_dir, os.O_DIRECTORY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def _assert_not_legacy_store(store_dir: str) -> None:
    """A store directory with CONTENT but no manifest is a pre-manifest
    (flat ``mode('append')``) layout — treating it as "no store yet"
    would silently skip the dedup screen and permanently duplicate every
    already-stored document on the next batch, so refuse loudly instead.
    Only the manifest-layout's own entries (``data/`` and manifest temp
    files) are expected beside a missing manifest (a crash before the
    very first commit leaves exactly those)."""
    if os.path.exists(_manifest_path(store_dir)) or not os.path.isdir(store_dir):
        return
    stray = [
        p
        for p in os.listdir(store_dir)
        if p != "data" and not p.startswith("manifest.json.tmp")
    ]
    if stray:
        raise RuntimeError(
            f"store_dir {store_dir!r} contains files but no manifest.json — "
            f"this looks like a pre-manifest flat-parquet store (found "
            f"{stray[:3]}...). Migrate it first: move the existing parquet "
            f"under data/batch-00000000-legacy/ and write a manifest "
            f"listing it; ingesting now would silently re-duplicate every "
            f"stored document."
        )


def read_dedup_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """THE reader for a manifest-committed dedup store: the union of the
    manifest's committed batch directories, or ``None`` when no batch has
    committed yet. Uncommitted/half-written data directories are never
    read — that is the point of the manifest. Refuses a manifest-less
    directory that already contains data (:func:`_assert_not_legacy_store`)."""
    _assert_not_legacy_store(store_dir)
    batches = _read_manifest(store_dir)
    if not batches:
        return None
    return spark.read.parquet(
        *[os.path.join(store_dir, "data", b) for b in batches]
    )


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
      so the anti join drops every one and nothing new commits —
      exactly-once effect without a transactional table format.

    Appends are MANIFEST-COMMITTED (layout at the top of this module):
    each batch's novel rows are written to their own
    ``data/batch-<epoch>`` directory — invisible to readers — and become
    part of the store only when the atomic manifest rename lands. A crash
    mid-write leaves an unreferenced directory the replay simply
    overwrites (same epoch id => same directory); a crash between data
    write and manifest rename replays the same way; a crash after the
    rename but before the checkpoint commit replays into an all-duplicate
    batch that commits nothing. There is no instant at which a reader
    (:func:`read_dedup_store`) can observe a torn store.

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
    # per-writer token: see the layout note at the top of this module
    writer_token = uuid.uuid4().hex[:8]

    def write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # the manifest IS the existence check: a store with no committed
        # batch is "no store yet" (first batch), and any read failure of
        # a COMMITTED directory must fail the batch so the streaming
        # checkpoint retries it — swallowing it would ingest the batch
        # with in-batch dedup only and permanently duplicate every
        # already-stored document it contains.
        seen = read_dedup_store(spark, store_dir)
        have_store = seen is not None
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
        # pin the novel slice once: the emptiness check, the bloom build,
        # and the data write would otherwise each re-execute the dedup plan
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            # all-duplicate batch (the replay-after-commit case): commit
            # nothing — an empty data directory would be unreadable and
            # pollute the manifest
            return
        if use_bloom:
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
        # manifest commit: data to an (epoch, writer-token)-keyed directory
        # nobody reads yet (overwrite => a crashed prior attempt of THIS
        # epoch in THIS run is replaced, not duplicated; the token keeps a
        # restarted run's epoch 0 from touching a committed dir), then the
        # atomic manifest rename publishes it
        dir_name = f"batch-{epoch_id:08d}-{writer_token}"
        fresh.write.mode("overwrite").parquet(
            os.path.join(store_dir, "data", dir_name)
        )
        batches = _read_manifest(store_dir)
        if dir_name not in batches:
            _commit_manifest(store_dir, batches + [dir_name])

    return write


def read_near_dedup_store(
    spark: SparkSession, store_dir: str
) -> tuple[DataFrame | None, DataFrame | None]:
    """Reader for a manifest-committed NEAR-dedup store: each committed
    batch directory holds BOTH the novel documents (``docs/``, with
    their persisted ``__fp__`` fingerprints) and their write-capped
    band-hash table (``bands/``) — one manifest rename publishes the
    PAIR atomically, so the two tables can never be observed out of
    sync. Returns ``(docs, bands)`` or ``(None, None)`` before the first
    commit. Refuses a manifest-less directory that already contains data
    (:func:`_assert_not_legacy_store`)."""
    _assert_not_legacy_store(store_dir)
    batches = _read_manifest(store_dir)
    if not batches:
        return None, None
    docs = spark.read.parquet(
        *[os.path.join(store_dir, "data", b, "docs") for b in batches]
    )
    bands = spark.read.parquet(
        *[os.path.join(store_dir, "data", b, "bands") for b in batches]
    )
    return docs, bands


def near_dedup_ingest_batch_writer(
    store_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    hot_bucket_cap: int = 256,
    hot_bucket_anchors: int = 8,
) -> Callable[[DataFrame, int], None]:
    """The FUZZY production ingest shape — the near-dedup composition of
    this module's exact loop (the x44 pattern: the composition IS the
    deliverable, no new operator code):

    1. in-batch EXACT dedup (:func:`functions.dedup.exact_dedup`, min-id
       canonical, fingerprints persisted as ``__fp__``);
    2. in-batch NEAR dedup (:func:`minhash_lsh_pairs` — hot-bucket
       bounded — then :func:`keep_cluster_representatives`);
    3. cross-store EXACT screen: anti join on the store's persisted
       fingerprint column (one pruned column, no re-hash);
    4. cross-store NEAR screen: :func:`near_dedup_against` probing the
       store's PERSISTED, WRITE-CAPPED band table (only the batch is
       signed; ``hot_bucket_cap=None`` on the probe because
       :func:`cap_band_buckets` already bounded the table at write
       time);
    5. manifest commit of the survivors' ``docs/`` AND their capped
       ``bands/`` in ONE atomic rename — the two tables stay in sync
       through any crash, and a replayed batch is all-exact-duplicates
       (step 3 empties it) so it commits nothing.

    The per-append band cap bounds every bucket's growth at
    ``hot_bucket_cap`` per commit (``hot_bucket_anchors`` when the
    batch's own bucket was hot), so probe fan-out stays bounded per
    append even as the store accumulates boilerplate clusters.
    """
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.dedup import (
        cap_band_buckets,
        exact_dedup,
        keep_cluster_representatives,
        minhash_band_hashes,
        minhash_lsh_pairs,
        near_dedup_against,
    )
    from hbsir_old_spark.functions.text import doc_fingerprint

    # per-writer token: see the layout note at the top of this module
    writer_token = uuid.uuid4().hex[:8]

    def write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        docs, band_tbl = read_near_dedup_store(spark, store_dir)
        tagged = batch.select(id_col, text_col).filter(F.col(text_col).isNotNull())
        fresh = exact_dedup(
            tagged.withColumn("__fp__", doc_fingerprint(text_col)),
            text_col=text_col, id_col=id_col, fingerprint_col="__fp__",
        )
        in_batch_pairs = minhash_lsh_pairs(
            fresh, id_col=id_col, text_col=text_col, n=n,
            num_perm=num_perm, bands=bands, threshold=threshold,
            hot_bucket_cap=hot_bucket_cap,
            hot_bucket_anchors=hot_bucket_anchors,
        )
        fresh = keep_cluster_representatives(fresh, in_batch_pairs, id_col=id_col)
        if docs is not None:
            seen_fp = docs.select(F.col("__fp__").alias("__sfp__")).distinct()
            fresh = fresh.join(
                seen_fp, F.col("__fp__") == F.col("__sfp__"), "left_anti"
            )
            near = near_dedup_against(
                fresh, docs, text_col=text_col, id_col=id_col,
                mode="lsh", threshold=threshold, n=n,
                num_perm=num_perm, bands=bands, store_bands=band_tbl,
                hot_bucket_cap=None,  # the persisted table is write-capped
            )
            fresh = near.filter(F.col("near_dup_of").isNull()).drop(
                "near_dup_of", "near_dup_jaccard"
            )
        # pin the survivors once: the emptiness check, the docs write,
        # and the band-table derivation would each re-run the whole
        # dedup cascade otherwise
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            return
        dir_name = f"batch-{epoch_id:08d}-{writer_token}"
        base = os.path.join(store_dir, "data", dir_name)
        fresh.write.mode("overwrite").parquet(os.path.join(base, "docs"))
        new_bands = cap_band_buckets(
            minhash_band_hashes(
                fresh, id_col=id_col, text_col=text_col,
                n=n, num_perm=num_perm, bands=bands,
            ),
            id_col=id_col,
            hot_bucket_cap=hot_bucket_cap,
            hot_bucket_anchors=hot_bucket_anchors,
        )
        new_bands.write.mode("overwrite").parquet(os.path.join(base, "bands"))
        batches = _read_manifest(store_dir)
        if dir_name not in batches:
            _commit_manifest(store_dir, batches + [dir_name])

    return write


def run_near_dedup_ingest(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_available_now: bool = True,
    n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    hot_bucket_cap: int = 256,
    hot_bucket_anchors: int = 8,
):
    """Wire a streaming document source into the FUZZY dedup-ingest sink
    (see :func:`near_dedup_ingest_batch_writer`): each micro-batch is
    exact- AND near-deduped within itself and against the growing store,
    and the novel survivors commit atomically together with their
    write-capped band-hash table."""
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            near_dedup_ingest_batch_writer(
                store_dir,
                text_col=text_col,
                id_col=id_col,
                n=n,
                num_perm=num_perm,
                bands=bands,
                threshold=threshold,
                hot_bucket_cap=hot_bucket_cap,
                hot_bucket_anchors=hot_bucket_anchors,
            )
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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


def image_dedup_ingest_batch_writer(
    store_dir: str,
    id_col: str = "asset_id",
    thumb_w: int = 6,
    thumb_h: int = 5,
    hash_h: int = 8,
    hash_w: int = 8,
    n_bands: int = 4,
    max_hamming: int = 6,
    hot_bucket_cap: int = 256,
    hot_bucket_anchors: int = 8,
) -> Callable[[DataFrame, int], None]:
    """The near-dedup ingest loop for IMAGE assets (VERDICT r13 #7) —
    :func:`near_dedup_ingest_batch_writer`'s shape with multimodal
    fingerprints substituted for the text ones (the x44 pattern: the
    composition IS the deliverable):

    1. one decode pass computes BOTH signatures per image: the
       byte-exact canonical-thumbnail sha2 (``__fp__``, integer-exact
       bilinear resize so it is bit-stable cross-platform — the x49
       fingerprint) and the perceptual dHash band array
       (:func:`~hbsir_old_spark.functions.multimodal.image_dhash`);
    2. in-batch EXACT dedup on ``__fp__`` (min-id canonical);
    3. in-batch NEAR dedup (banded Hamming pairs, hot-bucket bounded,
       then connected-component representatives);
    4. cross-store EXACT screen: anti join on the store's persisted
       ``__fp__`` column — a replayed batch is all-exact-duplicates, so
       it commits nothing (idempotent replay);
    5. cross-store NEAR screen: probe the store's PERSISTED, WRITE-CAPPED
       band table for candidates, verify popcount against the stored
       docs' full band arrays;
    6. manifest commit of the survivors' ``docs/`` (id, ``__fp__``,
       ``bands``) AND their write-capped exploded ``bands/`` in ONE
       atomic rename (:func:`read_near_dedup_store` reads the pair —
       same layout contract as the text store).

    Pixel payloads never reach a shuffle: both signatures leave the
    codec ``mapInPandas`` as (id, small-value) rows, and the store holds
    signatures only."""
    from pyspark.sql import functions as F

    from hbsir_old_spark.functions.dedup import (
        cap_band_buckets,
        exact_dedup,
        keep_cluster_representatives,
    )
    from hbsir_old_spark.functions.multimodal import (
        hamming_distance_bands,
        image_dhash,
        image_near_dup_pairs,
        resize_images,
    )

    # per-writer token: see the layout note at the top of this module
    writer_token = uuid.uuid4().hex[:8]

    def write(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        docs, band_tbl = read_near_dedup_store(spark, store_dir)
        assets = batch.filter(
            (F.col("kind") == "image") & F.col("content").isNotNull()
        )
        # pin the raw batch once: the two signature pipelines below would
        # otherwise each re-read (and re-decode) the source
        assets = assets.localCheckpoint(eager=True)
        fps = resize_images(
            assets, width=thumb_w, height=thumb_h, method="bilinear"
        ).select(id_col, F.sha2(F.col("pixels"), 256).alias("__fp__"))
        hashes = image_dhash(
            assets, hash_h=hash_h, hash_w=hash_w, n_bands=n_bands,
            method="nearest",
        )
        sigs = fps.join(hashes, id_col).localCheckpoint(eager=True)
        fresh = exact_dedup(
            sigs, id_col=id_col, fingerprint_col="__fp__"
        )
        pairs = image_near_dup_pairs(
            fresh.select(id_col, "bands"),
            id_col=id_col,
            max_hamming=max_hamming,
            hot_bucket_cap=hot_bucket_cap,
            hot_bucket_anchors=hot_bucket_anchors,
        )
        fresh = keep_cluster_representatives(fresh, pairs, id_col=id_col)
        if docs is not None:
            seen_fp = docs.select(F.col("__fp__").alias("__sfp__")).distinct()
            fresh = fresh.join(
                seen_fp, F.col("__fp__") == F.col("__sfp__"), "left_anti"
            )
            probe = fresh.select(
                F.col(id_col).alias("__bid__"),
                F.posexplode("bands").alias("band", "bh"),
            )
            cand = (
                probe.join(
                    band_tbl.select(
                        F.col(id_col).alias("__sid__"), "band", "bh"
                    ),
                    ["band", "bh"],
                )
                .select("__bid__", "__sid__")
                .distinct()
            )
            hits = (
                cand.join(
                    fresh.select(
                        F.col(id_col).alias("__bid__"),
                        F.col("bands").alias("__bbands__"),
                    ),
                    "__bid__",
                )
                .join(
                    docs.select(
                        F.col(id_col).alias("__sid__"),
                        F.col("bands").alias("__sbands__"),
                    ),
                    "__sid__",
                )
                .withColumn(
                    "__h__",
                    hamming_distance_bands(
                        F.col("__bbands__"), F.col("__sbands__")
                    ),
                )
                .filter(F.col("__h__") <= max_hamming)
                .select(F.col("__bid__").alias(id_col))
                .distinct()
            )
            fresh = fresh.join(hits, id_col, "left_anti")
        # pin the survivors once: the emptiness check, the docs write,
        # and the band-table derivation would each re-run the cascade
        fresh = fresh.localCheckpoint(eager=True)
        if fresh.isEmpty():
            return
        dir_name = f"batch-{epoch_id:08d}-{writer_token}"
        base = os.path.join(store_dir, "data", dir_name)
        fresh.write.mode("overwrite").parquet(os.path.join(base, "docs"))
        new_bands = cap_band_buckets(
            fresh.select(
                id_col, F.posexplode("bands").alias("band", "bh")
            ),
            id_col=id_col,
            hot_bucket_cap=hot_bucket_cap,
            hot_bucket_anchors=hot_bucket_anchors,
        )
        new_bands.write.mode("overwrite").parquet(os.path.join(base, "bands"))
        batches = _read_manifest(store_dir)
        if dir_name not in batches:
            _commit_manifest(store_dir, batches + [dir_name])

    return write


def run_image_dedup_ingest(
    stream: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    id_col: str = "asset_id",
    trigger_available_now: bool = True,
    thumb_w: int = 6,
    thumb_h: int = 5,
    hash_h: int = 8,
    hash_w: int = 8,
    n_bands: int = 4,
    max_hamming: int = 6,
    hot_bucket_cap: int = 256,
    hot_bucket_anchors: int = 8,
):
    """Wire a streaming IMAGE asset source (``asset_id``, ``kind``,
    ``content`` binary) into the image dedup-ingest sink (see
    :func:`image_dedup_ingest_batch_writer`): each micro-batch is exact-
    and near-deduped within itself and against the growing signature
    store, and the novel survivors' signatures commit atomically with
    their write-capped band table."""
    writer = (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(
            image_dedup_ingest_batch_writer(
                store_dir,
                id_col=id_col,
                thumb_w=thumb_w,
                thumb_h=thumb_h,
                hash_h=hash_h,
                hash_w=hash_w,
                n_bands=n_bands,
                max_hamming=max_hamming,
                hot_bucket_cap=hot_bucket_cap,
                hot_bucket_anchors=hot_bucket_anchors,
            )
        )
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
