"""rolling_aggregate / sessionize_batch semantics + plan-shape pins.

The batch twin of streaming sessionization (streaming/events.py sessionize)
and the trailing-window smoothing primitive. Reference parity: the
reference's consumers do this post-processing in pandas
(``rolling(window)`` / gap-based session assignment); here both are single-
shuffle window formulations.
"""

import datetime as dt

import pytest

from hbsir_old_spark.operators.temporal import rolling_aggregate, sessionize_batch


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: bursts at 0-2 min, then 120-121 (gap 118 min)
        (1, 1, _ts(0), 10.0),
        (2, 1, _ts(1), 20.0),
        (3, 1, _ts(2), 30.0),
        (4, 1, _ts(120), 40.0),
        (5, 1, _ts(121), 50.0),
        # user 2: single event
        (6, 2, _ts(5), 60.0),
        # user 3: two events exactly 30 min apart (boundary: NOT a new
        # session — the gap must be strictly greater)
        (7, 3, _ts(0), 70.0),
        (8, 3, _ts(30), 80.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


class TestRollingAggregate:
    def test_trailing_avg_matches_hand_computation(self, events):
        out = rolling_aggregate(
            events,
            partition_by="user_id",
            order_by="ts",
            value_col="value",
            window=3,
            agg="avg",
            tiebreakers=["event_id"],
            out_col="roll",
        )
        got = {r["event_id"]: r["roll"] for r in out.collect()}
        assert got[1] == 10.0  # frame = [10]
        assert got[2] == 15.0  # [10, 20]
        assert got[3] == 20.0  # [10, 20, 30]
        assert got[4] == 30.0  # [20, 30, 40] — frame is row-based, not time
        assert got[5] == 40.0  # [30, 40, 50]
        assert got[6] == 60.0  # other user unaffected

    def test_rolling_sum_and_count(self, events):
        out = rolling_aggregate(
            events,
            partition_by="user_id",
            order_by="ts",
            value_col="value",
            window=2,
            agg="sum",
            tiebreakers=["event_id"],
            out_col="s",
        )
        got = {r["event_id"]: r["s"] for r in out.collect()}
        assert got[3] == 50.0  # [20, 30]
        assert got[5] == 90.0  # [40, 50]

    def test_unknown_agg_raises(self, events):
        with pytest.raises(ValueError, match="unknown rolling agg"):
            rolling_aggregate(
                events, "user_id", "ts", "value", 3, agg="median"
            )

    def test_single_exchange(self, events):
        out = rolling_aggregate(
            events, "user_id", "ts", "value", 3, agg="avg", tiebreakers=["event_id"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") <= 1


class TestSessionizeBatch:
    def test_session_assignment(self, events):
        out = sessionize_batch(
            events, "user_id", "ts", gap="30 minutes", tiebreakers=["event_id"]
        )
        got = {r["event_id"]: r["session_id"] for r in out.collect()}
        # user 1: first burst session 1, second burst session 2
        assert (got[1], got[2], got[3]) == (1, 1, 1)
        assert (got[4], got[5]) == (2, 2)
        # user 2: single-event session
        assert got[6] == 1
        # user 3: exactly-at-gap boundary stays in the SAME session
        assert (got[7], got[8]) == (1, 1)

    def test_strictly_greater_gap_starts_new_session(self, spark):
        rows = [(1, 1, _ts(0), 0.0), (2, 1, _ts(31), 0.0)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp, value double"
        )
        out = sessionize_batch(df, "user_id", "ts", gap="30 minutes")
        got = {r["event_id"]: r["session_id"] for r in out.collect()}
        assert (got[1], got[2]) == (1, 2)

    def test_malformed_gap_raises_early(self, events):
        # same ADVICE-r10 guard as funnel_steps' within: the gap string
        # feeds an INTERVAL literal and must fail loudly at the call site
        import pytest

        # "0.5 hours" is invalid in Spark itself (INVALID_FRACTION) —
        # the validator mirrors that rule with a clearer error
        for bad in ("30 parsecs", "x; SELECT 1", "", "0.5 hours"):
            with pytest.raises(ValueError, match="gap"):
                sessionize_batch(events, "user_id", "ts", gap=bad)
        # fractional SECONDS are valid Spark INTERVALs and must pass
        # (review-pass regression: the first validator rejected them)
        out = sessionize_batch(events, "user_id", "ts", gap="1800.0 seconds")
        got = {r["event_id"]: r["session_id"] for r in out.collect()}
        want = {
            r["event_id"]: r["session_id"]
            for r in sessionize_batch(
                events, "user_id", "ts", gap="30 minutes"
            ).collect()
        }
        assert got == want

    def test_both_windows_share_one_exchange(self, events):
        """The lag window and the running-sum window sort identically, so
        Catalyst must plan ONE Exchange + sort — re-shuffling between the
        two windows would double the dominant cost at corpus scale."""
        out = sessionize_batch(
            events, "user_id", "ts", gap="30 minutes", tiebreakers=["event_id"]
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
