"""applyInPandasWithState: per-key state across micro-batches equals the
batch aggregate at stream end."""

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.streaming.stateful import cumulative_user_stats  # noqa: E402


@pytest.fixture(scope="module")
def multi_file_events(spark, sf_dir, tmp_path_factory):
    """Several parquet files so availableNow produces multiple batches and
    state actually carries across them."""
    out = str(tmp_path_factory.mktemp("events_files"))
    from __spark_entry__ import _events

    events = _events(spark, sf_dir).limit(3000)
    events.repartition(6).write.mode("overwrite").parquet(out)
    return out


def test_stateful_totals_match_batch(spark, multi_file_events):
    schema = spark.read.parquet(multi_file_events).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)  # force multiple micro-batches
        .parquet(multi_file_events)
    )
    query = (
        cumulative_user_stats(stream)
        .writeStream.format("memory")
        .queryName("cum_mem")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)  # seconds, not ms
    deadline = time.time() + 120
    while query.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert query.lastProgress is not None
    assert len(query.recentProgress) >= 2, "expected multiple micro-batches"

    # latest update per user == plain batch aggregate
    streamed = spark.sql(
        """
        SELECT user_id, n_events, sum_value FROM (
          SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY n_events DESC) rn
          FROM cum_mem
        ) WHERE rn = 1
        """
    ).toPandas().set_index("user_id").sort_index()
    batch = (
        spark.read.parquet(multi_file_events)
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum(F.coalesce("value", F.lit(0.0))).alias("sum_value"))
        .toPandas().set_index("user_id").sort_index()
    )
    assert (streamed["n_events"] == batch["n_events"]).all()
    assert (streamed["sum_value"] - batch["sum_value"]).abs().max() < 1e-6


class TestDedupIngest:
    """Streaming corpus ingest: dedup-against-store via foreachBatch
    (streaming/sink.py:run_dedup_ingest)."""

    def _ingest(self, spark, tmp_path, rows, name):
        src = str(tmp_path / f"src_{name}")
        store = str(tmp_path / f"store_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        spark.createDataFrame(rows, ["doc_id", "text"]).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        from hbsir_old_spark.streaming.sink import run_dedup_ingest

        q = run_dedup_ingest(stream, store, ckpt)
        q.awaitTermination(120)
        return src, store, ckpt

    def test_ingest_dedups_within_and_against_store(self, spark, tmp_path):
        from hbsir_old_spark.streaming.sink import run_dedup_ingest

        src, store, ckpt = self._ingest(
            spark,
            tmp_path,
            [(1, "alpha doc"), (2, "ALPHA   doc"), (3, "beta doc")],  # 2 dups 1
            "a",
        )
        first = {r["doc_id"] for r in spark.read.parquet(store).collect()}
        assert first == {1, 3}
        # second delivery: one stored dup, one new
        spark.createDataFrame(
            [(10, "beta DOC"), (11, "gamma doc")], ["doc_id", "text"]
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = run_dedup_ingest(stream, store, ckpt)
        q.awaitTermination(120)
        rows = spark.read.parquet(store).collect()
        assert {r["doc_id"] for r in rows} == {1, 3, 11}
        # the persisted fingerprint column is the store's join key
        assert all(r["__fp__"] is not None for r in rows)

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        # simulate a replay (crash between append and checkpoint commit):
        # run the SAME source through a FRESH checkpoint — every doc is
        # already in the store, so the anti join drops all of them
        from hbsir_old_spark.streaming.sink import run_dedup_ingest

        src, store, _ = self._ingest(
            spark, tmp_path, [(1, "alpha doc"), (2, "beta doc")], "b"
        )
        n_before = spark.read.parquet(store).count()
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = run_dedup_ingest(stream, store, str(tmp_path / "ckpt_b2"))
        q.awaitTermination(120)
        assert spark.read.parquet(store).count() == n_before

    def test_null_text_rows_are_dropped_not_stored(self, spark, tmp_path):
        # a NULL text fingerprints to NULL, which the anti join can never
        # match — storing it would re-append it on EVERY replay. The sink
        # drops such rows at ingest (documented contract).
        from hbsir_old_spark.streaming.sink import run_dedup_ingest

        src = str(tmp_path / "src_n")
        store = str(tmp_path / "store_n")
        spark.createDataFrame(
            [(1, "real doc"), (2, None)], "doc_id long, text string"
        ).write.mode("append").parquet(src)
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = run_dedup_ingest(stream, store, str(tmp_path / "ckpt_n"))
        q.awaitTermination(120)
        assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {1}
        # replay with a fresh checkpoint: still exactly one row
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = run_dedup_ingest(stream, store, str(tmp_path / "ckpt_n2"))
        q.awaitTermination(120)
        assert spark.read.parquet(store).count() == 1


class TestDedupIngestBloom:
    """The bloom-accelerated ingest path must behave identically to the
    exact path: cross-batch dedup, session-warmup rebuild, and replay
    idempotence (the merge-before-append crash ordering)."""

    def _run(self, spark, src, store, ckpt):
        from hbsir_old_spark.streaming.sink import run_dedup_ingest

        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = run_dedup_ingest(stream, store, ckpt, use_bloom=True)
        q.awaitTermination(120)

    def test_bloom_ingest_dedups_across_batches_and_sessions(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src_bl")
        store = str(tmp_path / "store_bl")
        spark.createDataFrame(
            [(1, "alpha doc"), (2, "ALPHA   doc"), (3, "beta doc")],
            ["doc_id", "text"],
        ).write.mode("append").parquet(src)
        self._run(spark, src, store, str(tmp_path / "ckpt_bl1"))
        assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {1, 3}
        # second delivery, NEW writer (fresh bloom state): the session
        # warmup must rebuild the filter from the store so doc 10 (a dup
        # of stored doc 3) is dropped, not false-kept
        spark.createDataFrame(
            [(10, "beta DOC"), (11, "gamma doc")], ["doc_id", "text"]
        ).write.mode("append").parquet(src)
        self._run(spark, src, store, str(tmp_path / "ckpt_bl1"))
        assert {r["doc_id"] for r in spark.read.parquet(store).collect()} == {
            1,
            3,
            11,
        }

    def test_bloom_replay_is_idempotent(self, spark, tmp_path):
        src = str(tmp_path / "src_br")
        store = str(tmp_path / "store_br")
        spark.createDataFrame(
            [(1, "alpha doc"), (2, "beta doc")], ["doc_id", "text"]
        ).write.mode("append").parquet(src)
        self._run(spark, src, store, str(tmp_path / "ckpt_br1"))
        n = spark.read.parquet(store).count()
        # replay through a FRESH checkpoint AND fresh bloom state: the
        # warmup rebuild covers the store, so every doc bloom-hits and the
        # verify join drops them all
        self._run(spark, src, store, str(tmp_path / "ckpt_br2"))
        assert spark.read.parquet(store).count() == n
