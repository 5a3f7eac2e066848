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
