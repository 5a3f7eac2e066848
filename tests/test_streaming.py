"""Structured Streaming tests: the SAME transformation functions used by
the batch oracle queries run on a file-source stream with watermarks,
proving the operators are streaming-safe (SURVEY §7.2 M7)."""

import os
import shutil
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.streaming.events import sessionize, tumbling_stats  # noqa: E402


@pytest.fixture(scope="module")
def event_stream_dir(spark, sf_dir, tmp_path_factory):
    """Materialize the events table as a small parquet directory usable as a
    file stream source (micro-batches discover files)."""
    out = str(tmp_path_factory.mktemp("event_stream"))
    from __spark_entry__ import _events

    events = _events(spark, sf_dir).limit(2000)
    events.coalesce(4).write.mode("overwrite").parquet(out)
    return out


def _run_stream_to_memory(spark, stream_df, name: str, timeout_s: int = 60):
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(timeout_s)  # seconds, not ms
    deadline = time.time() + timeout_s
    while query.isActive and time.time() < deadline:
        time.sleep(0.5)
    return spark.sql(f"SELECT * FROM {name}")


def test_tumbling_stats_stream_matches_batch(spark, event_stream_dir):
    schema = spark.read.parquet(event_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    streamed = _run_stream_to_memory(
        spark,
        tumbling_stats(stream, window="1 hour", with_watermark="2 hours"),
        "tumbling_mem",
    ).toPandas()
    batch = tumbling_stats(
        spark.read.parquet(event_stream_dir), window="1 hour"
    ).toPandas()
    key = ["window_start", "event_type"]
    left = streamed.sort_values(key).reset_index(drop=True)
    right = batch.sort_values(key).reset_index(drop=True)
    assert len(left) == len(right) > 0
    assert (left["n_events"].values == right["n_events"].values).all()


def test_streaming_dedup_within_watermark(spark, event_stream_dir, tmp_path):
    """Streaming exactly-once dedup: duplicate event_ids arriving within the
    watermark are dropped (dropDuplicatesWithinWatermark) — the streaming
    face of the dedup operator family."""
    dup_dir = str(tmp_path / "dup_events")
    base = spark.read.parquet(event_stream_dir).limit(500)
    base.unionByName(base).coalesce(2).write.mode("overwrite").parquet(dup_dir)

    schema = spark.read.parquet(dup_dir).schema
    stream = spark.readStream.schema(schema).parquet(dup_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    query = (
        deduped.writeStream.format("memory")
        .queryName("dedup_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(60)  # seconds, not ms
    deadline = time.time() + 60
    while query.isActive and time.time() < deadline:
        time.sleep(0.5)
    assert spark.sql("SELECT count(DISTINCT event_id) FROM dedup_mem").collect()[0][0] == 500
    assert spark.table("dedup_mem").count() == 500  # duplicates dropped


def test_sessionize_stream_runs_with_state(spark, event_stream_dir):
    schema = spark.read.parquet(event_stream_dir).schema
    stream = spark.readStream.schema(schema).parquet(event_stream_dir)
    sessions = _run_stream_to_memory(
        spark,
        sessionize(stream, gap="5 minutes", with_watermark="1 hour"),
        "sessions_mem",
    )
    pdf = sessions.toPandas()
    assert len(pdf) > 0
    # session invariant: within a user, consecutive session starts are at
    # least the gap apart
    import pandas as pd

    for _, grp in pdf.sort_values("session_start").groupby("user_id"):
        diffs = grp["session_start"].diff().dropna()
        assert (diffs >= pd.Timedelta(minutes=5)).all()


class TestUpsertSink:
    def _start(self, spark, src_dir, target, ckpt):
        from hbsir_old_spark.streaming.sink import run_windowed_upsert

        schema = spark.read.parquet(src_dir).schema
        stream = spark.readStream.schema(schema).parquet(src_dir)
        agg = tumbling_stats(stream, window="1 hour", with_watermark="2 hours")
        q = run_windowed_upsert(
            agg, target, ckpt, partition_cols=["event_type"]
        )
        q.awaitTermination(60)  # seconds, not ms
        deadline = time.time() + 60
        while q.isActive and time.time() < deadline:
            time.sleep(0.5)

    def test_windowed_upsert_matches_batch(self, spark, event_stream_dir, tmp_path):
        target = str(tmp_path / "agg")
        ckpt = str(tmp_path / "ckpt")
        self._start(spark, event_stream_dir, target, ckpt)
        got = spark.read.parquet(target).toPandas()
        want = tumbling_stats(
            spark.read.parquet(event_stream_dir), window="1 hour"
        ).toPandas()
        key = ["window_start", "event_type"]
        got = got.sort_values(key).reset_index(drop=True)[want.columns]
        want = want.sort_values(key).reset_index(drop=True)
        assert got.equals(want)

    def test_restart_with_same_checkpoint_is_idempotent(
        self, spark, event_stream_dir, tmp_path
    ):
        target = str(tmp_path / "agg2")
        ckpt = str(tmp_path / "ckpt2")
        self._start(spark, event_stream_dir, target, ckpt)
        first = spark.read.parquet(target).count()
        # re-running with the same checkpoint finds no new files and must
        # not duplicate or clobber existing partitions
        self._start(spark, event_stream_dir, target, ckpt)
        assert spark.read.parquet(target).count() == first


def test_interval_join_malformed_within_raises(spark, event_stream_dir):
    # the within string feeds an INTERVAL literal (same ADVICE-r10 guard
    # as sessionize_batch's gap / funnel_steps' within)
    import pytest

    from hbsir_old_spark.streaming.events import interval_join

    df = spark.read.parquet(event_stream_dir)
    left = df.select("user_id", "ts", "event_id")
    with pytest.raises(ValueError, match="within"):
        interval_join(left, df, within="30 lightyears")


def test_interval_join_stream_matches_batch(spark, event_stream_dir):
    """Stream-stream interval join: two watermarked readStream sources join
    on (key, time-range); append mode emits exactly the batch pairs once
    the availableNow trigger drains the source."""
    from hbsir_old_spark.streaming.events import interval_join

    schema = spark.read.parquet(event_stream_dir).schema

    def sides(df):
        clicks = df.filter(df["event_type"] == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = df.filter(df["event_type"] == "purchase").select(
            "user_id", "ts", "event_id", "value"
        )
        return clicks, purchases

    sc, sp = sides(spark.readStream.schema(schema).parquet(event_stream_dir))
    joined = interval_join(
        sc,
        sp,
        within="30 minutes",
        left_watermark="2 hours",
        right_watermark="2 hours",
    )
    query = (
        joined.writeStream.format("memory")
        .queryName("ij_mem")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)  # seconds, not ms
    import time as _t

    deadline = _t.time() + 120
    while query.isActive and _t.time() < deadline:
        _t.sleep(0.5)
    streamed = spark.sql("SELECT event_id, event_id_r FROM ij_mem").toPandas()

    bc, bp = sides(spark.read.parquet(event_stream_dir))
    batch = (
        interval_join(bc, bp, within="30 minutes")
        .select("event_id", "event_id_r")
        .toPandas()
    )
    key = ["event_id", "event_id_r"]
    left = streamed.sort_values(key).reset_index(drop=True)
    right = batch.sort_values(key).reset_index(drop=True)
    assert len(left) == len(right) > 0
    assert (left[key].values == right[key].values).all()
