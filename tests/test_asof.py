"""As-of join semantics (operators/temporal.py): inclusive backward /
forward matching, tolerance, ties, keys with no right rows, and the
single-shuffle plan shape."""

import datetime as dt
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.operators.temporal import asof_join  # noqa: E402


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, _t(10), "p1"), (1, _t(20), "p2"), (2, _t(5), "p3"), (3, _t(7), "p4")],
        ["uid", "ts", "order"],
    )
    right = spark.createDataFrame(
        [(1, _t(8), 100.0), (1, _t(15), 200.0), (1, _t(20), 300.0), (2, _t(9), 400.0)],
        ["uid", "ts", "price"],
    )
    return left, right


def _by_order(rows):
    return {r["order"]: r["price"] for r in rows}


def test_backward_inclusive(spark):
    left, right = _fixtures(spark)
    out = asof_join(left, right, "ts", ["uid"]).collect()
    assert len(out) == 4  # left-preserving
    assert _by_order(out) == {"p1": 100.0, "p2": 300.0, "p3": None, "p4": None}
    matched_ts = {r["order"]: r["ts_right"] for r in out}
    assert matched_ts["p1"] == _t(8) and matched_ts["p2"] == _t(20)


def test_forward_inclusive(spark):
    left, right = _fixtures(spark)
    out = asof_join(left, right, "ts", ["uid"], direction="forward").collect()
    assert _by_order(out) == {"p1": 200.0, "p2": 300.0, "p3": 400.0, "p4": None}


def test_tolerance_voids_stale_matches(spark):
    left, right = _fixtures(spark)
    out = asof_join(left, right, "ts", ["uid"], tolerance_s=3).collect()
    # p1's match (8) is 2s old -> kept; p3 has no match within anything
    assert _by_order(out) == {"p1": 100.0, "p2": 300.0, "p3": None, "p4": None}


def test_colliding_value_column_gets_suffix(spark):
    left, right = _fixtures(spark)
    right2 = right.withColumnRenamed("price", "order")  # collides with left
    out = asof_join(left, right2, "ts", ["uid"]).collect()
    assert "order_right" in out[0].asDict()
    assert {r["order"]: r["order_right"] for r in out}["p2"] == 300.0


def test_null_right_value_matches_atomically(spark):
    # the nearest right row wins AS A WHOLE: a NULL value field must come
    # through as NULL with that row's ts — not stitched together with an
    # older row's non-NULL value (per-column last(ignorenulls) would)
    left = spark.createDataFrame([(1, _t(10), "p1")], ["uid", "ts", "order"])
    right = spark.createDataFrame(
        [(1, _t(5), 100.0), (1, _t(8), None)], ["uid", "ts", "price"]
    )
    out = asof_join(left, right, "ts", ["uid"]).collect()
    assert len(out) == 1
    assert out[0]["price"] is None
    assert out[0]["ts_right"] == _t(8)
    # with a tolerance excluding ts=5 but not ts=8, the stale 100.0 must
    # not leak through either
    out = asof_join(left, right, "ts", ["uid"], tolerance_s=3).collect()
    assert out[0]["price"] is None and out[0]["ts_right"] == _t(8)


def test_matched_ts_name_collision_raises(spark):
    import pytest

    left, right = _fixtures(spark)
    right2 = right.withColumnRenamed("price", "ts_right")
    with pytest.raises(ValueError, match="ts_right"):
        asof_join(left, right2, "ts", ["uid"])


def test_single_shuffle_plan(spark):
    left, right = _fixtures(spark)
    plan = (
        asof_join(left, right, "ts", ["uid"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one Exchange for the window, no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_null_keys_never_match(spark):
    # DuckDB ASOF / pandas merge_asof semantics: a NULL equi-key matches
    # nothing. Window.partitionBy alone would group NULLs together and
    # match the NULL-uid left row to the NULL-uid right row.
    left = spark.createDataFrame(
        [(None, _t(10), "pX"), (1, _t(10), "p1")], ["uid", "ts", "order"]
    )
    right = spark.createDataFrame(
        [(None, _t(5), 666.0), (1, _t(5), 100.0)], ["uid", "ts", "price"]
    )
    out = {r["order"]: r for r in asof_join(left, right, "ts", ["uid"]).collect()}
    assert len(out) == 2  # NULL-key left row survives, unmatched
    assert out["pX"]["price"] is None and out["pX"]["ts_right"] is None
    assert out["p1"]["price"] == 100.0
