"""Bucketed co-located joins (no Exchange in the plan) and salted joins
(identical results to plain joins under skew)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.operators.scale import (  # noqa: E402
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority", "o_totalprice"
    )
    write_bucketed(li, "li_bucketed", ["l_orderkey"], num_buckets=8, sort_by=["l_orderkey"])
    write_bucketed(orders, "orders_bucketed", ["l_orderkey"], num_buckets=8, sort_by=["l_orderkey"])
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # at this SF the right side is broadcastable, which (correctly)
        # beats bucketing; disable broadcast to expose the 100 TB fact-fact
        # shape where co-location is the win
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "li_bucketed", "orders_bucketed", ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketed join must not shuffle"
        assert "Bucketed: true" in plan
        plain = li.join(orders, "l_orderkey").count()
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_salted_join_matches_plain_join(spark):
    # heavy skew: 90% of left rows share one key
    left = spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("rv")
    )
    plain = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("rv").alias("s"), F.sum("payload").alias("p")
    ).collect()[0]
    salted = salted_join(left, right, "k", factor=8).agg(
        F.count("*").alias("n"), F.sum("rv").alias("s"), F.sum("payload").alias("p")
    ).collect()[0]
    assert (plain["n"], plain["s"], plain["p"]) == (salted["n"], salted["s"], salted["p"])


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], schema="k int, v string")
    right = spark.createDataFrame([(1, 10)], schema="k int, rv int")
    out = salted_join(left, right, "k", factor=4, how="left").collect()
    by_key = {r["k"]: r["rv"] for r in out}
    assert by_key == {1: 10, 99: None}
    assert len(out) == 2


def test_write_bucketed_survives_orphaned_location(spark):
    """A previous PROCESS can leave the managed-table directory behind while
    a fresh session's catalog has no entry for it; saveAsTable(overwrite)
    then raises LOCATION_ALREADY_EXISTS (the r13 driver run reproduced this
    against test_dedup_clusters). write_bucketed must clear the stale
    location and succeed."""
    from pathlib import Path
    from urllib.parse import urlparse

    table = "orphan_loc_bucketed"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = Path(urlparse(str(spark.conf.get("spark.sql.warehouse.dir"))).path)
    stale = warehouse / table
    stale.mkdir(parents=True, exist_ok=True)
    (stale / "leftover.parquet").write_bytes(b"not a real parquet")
    try:
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") * 3).alias("v")
        )
        write_bucketed(df, table, ["k"], num_buckets=4)
        assert spark.table(table).count() == 100
        # overwrite over our OWN table (catalog entry present) still works
        write_bucketed(df.limit(10), table, ["k"], num_buckets=4)
        assert spark.table(table).count() == 10
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
