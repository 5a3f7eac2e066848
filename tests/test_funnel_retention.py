"""Batch events-analytics operators: strict-order funnel + retention
cohorts (operators/temporal.py). Semantics pinned on hand-built frames,
then cross-checked against a pure-Python reference on the real events
table; plan shape pinned (pushed type filter, no cartesian, no UDF).

Reference analogue: none — beyond-reference events-analytics operators
(builder's brief); the s8/s9 gates carry the DuckDB oracles.
"""

import datetime as dt
import io

import pytest
from pyspark.sql import functions as F

from hbsir_old_spark.operators.temporal import (
    funnel_counts,
    funnel_steps,
    retention_cohorts,
)


def _ts(day, hour=0, minute=0):
    return dt.datetime(2024, 1, day, hour, minute)


EVENT_SCHEMA = "user_id long, ts timestamp, event_type string"


@pytest.fixture(scope="module")
def toy_events(spark):
    rows = [
        # A: clean view -> click -> purchase
        (1, _ts(1), "view"),
        (1, _ts(2), "click"),
        (1, _ts(3), "purchase"),
        # B: click BEFORE the first view never counts; no click after the
        # view, so the funnel stalls at step 2 and purchase stays NULL
        # even though a purchase event exists after the view
        (2, _ts(1), "click"),
        (2, _ts(2), "view"),
        (2, _ts(3), "purchase"),
        # C: skips click entirely -> stalls at step 2
        (3, _ts(1), "view"),
        (3, _ts(2), "purchase"),
        # D: click at EXACTLY the view ts -> strict 'after' excludes it
        (4, _ts(1), "view"),
        (4, _ts(1), "click"),
        # E: never views -> not in the per-user frame at all
        (5, _ts(1), "click"),
        (5, _ts(2), "purchase"),
        # F: click lands exactly AT the 7-day deadline (inclusive);
        # purchase lands past it (excluded by `within`)
        (6, _ts(1), "view"),
        (6, _ts(8), "click"),
        (6, _ts(9), "purchase"),
        # noise type that is not in the funnel
        (1, _ts(1, 12), "error"),
    ]
    return spark.createDataFrame(rows, EVENT_SCHEMA)


STEPS = ["view", "click", "purchase"]


class TestFunnelSemantics:
    def test_per_user_strict_order(self, toy_events):
        out = {
            r["user_id"]: (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"])
            for r in funnel_steps(
                toy_events, "user_id", "ts", "event_type", STEPS
            ).collect()
        }
        assert set(out) == {1, 2, 3, 4, 6}  # user 5 never viewed
        assert out[1] == (_ts(1), _ts(2), _ts(3))
        # B: stalled funnels never resume — purchase after view does NOT
        # count without an intervening click
        assert out[2] == (_ts(2), None, None)
        assert out[3] == (_ts(1), None, None)
        # D: same-timestamp click is not strictly after the view
        assert out[4] == (_ts(1), None, None)
        assert out[6] == (_ts(1), _ts(8), _ts(9))

    def test_within_deadline_is_inclusive_and_anchored_at_step1(
        self, toy_events
    ):
        out = {
            r["user_id"]: (r["step_2_ts"], r["step_3_ts"])
            for r in funnel_steps(
                toy_events, "user_id", "ts", "event_type", STEPS, within="7 days"
            ).collect()
        }
        # F: click at view+7d exactly -> kept (<= deadline); purchase at
        # view+8d -> dropped (deadline anchors at step 1, not step 2)
        assert out[6] == (_ts(8), None)
        assert out[1] == (_ts(2), _ts(3))

    def test_counts_and_conversion(self, toy_events):
        rows = (
            funnel_counts(toy_events, "user_id", "ts", "event_type", STEPS)
            .orderBy("step_index")
            .collect()
        )
        assert [(r["step_name"], r["users"]) for r in rows] == [
            ("view", 5),
            ("click", 2),
            ("purchase", 2),
        ]
        assert [r["conversion"] for r in rows] == [1.0, 0.4, 0.4]

    def test_counts_on_empty_input(self, toy_events, spark):
        empty = spark.createDataFrame([], EVENT_SCHEMA)
        rows = (
            funnel_counts(empty, "user_id", "ts", "event_type", STEPS)
            .orderBy("step_index")
            .collect()
        )
        assert [r["users"] for r in rows] == [0, 0, 0]
        assert [r["conversion"] for r in rows] == [None, None, None]

    def test_validation(self, toy_events):
        with pytest.raises(ValueError, match="at least one"):
            funnel_steps(toy_events, "user_id", "ts", "event_type", [])
        with pytest.raises(ValueError, match="distinct"):
            funnel_steps(
                toy_events, "user_id", "ts", "event_type", ["view", "view"]
            )

    def test_malformed_within_interval_raises_early(self, toy_events):
        # the caller string is interpolated into an INTERVAL literal; a
        # malformed/config-driven value must be a clear ValueError at the
        # call site, not an arbitrary SQL expression or an opaque parse
        # error at execution time (ADVICE r10)
        # (within="" is falsy and means "no deadline", like within=None)
        for bad in ("7 fortnights", "1; DROP TABLE x", "hours 3"):
            with pytest.raises(ValueError, match="within"):
                funnel_steps(
                    toy_events,
                    "user_id",
                    "ts",
                    "event_type",
                    ["view", "cart"],
                    within=bad,
                )
        # compound day-time literals stay accepted
        funnel_steps(
            toy_events,
            "user_id",
            "ts",
            "event_type",
            ["view", "cart"],
            within="1 day 12 hours",
        ).collect()


def _python_funnel(rows, steps, within_days=None):
    """Pure-Python strict-order funnel over (user, ts, type) tuples."""
    by_user = {}
    for user, ts, typ in rows:
        by_user.setdefault(user, []).append((ts, typ))
    reached = {}
    for user, evs in by_user.items():
        evs.sort()
        t1 = min((ts for ts, typ in evs if typ == steps[0]), default=None)
        if t1 is None:
            continue
        hit = [t1]
        deadline = (
            t1 + dt.timedelta(days=within_days) if within_days else None
        )
        cur = t1
        for step in steps[1:]:
            cur = min(
                (
                    ts
                    for ts, typ in evs
                    if typ == step
                    and ts > cur
                    and (deadline is None or ts <= deadline)
                ),
                default=None,
            )
            if cur is None:
                break
            hit.append(cur)
        reached[user] = tuple(hit)
    return reached


class TestFunnelCrossCheck:
    def test_matches_python_reference_on_real_events(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        steps = ["signup", "view", "purchase"]
        got = {
            r["user_id"]: tuple(
                t for t in (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"])
                if t is not None
            )
            for r in funnel_steps(
                ev, "user_id", "ts", "event_type", steps, within="10 days"
            ).collect()
        }
        raw = [
            (r["user_id"], r["ts"], r["event_type"])
            for r in ev.select("user_id", "ts", "event_type").collect()
        ]
        want = _python_funnel(raw, steps, within_days=10)
        assert got == want
        assert len(got) > 0


class TestRetention:
    def test_week_cohorts_hand_built(self, spark):
        # 2024-01-01 is a Monday; weeks truncate to Mondays in both engines
        rows = [
            (1, _ts(2)),   # cohort week Mon Jan 1
            (1, _ts(4)),   # same week -> still offset 0, ONE row
            (1, _ts(16)),  # week of Jan 15 -> offset 2
            (2, _ts(8)),   # cohort week Mon Jan 8
            (2, _ts(15)),  # offset 1
        ]
        out = {
            (r["cohort"], r["offset"]): r["active_users"]
            for r in retention_cohorts(
                spark.createDataFrame(rows, "user_id long, ts timestamp"),
                "user_id",
                "ts",
            ).collect()
        }
        jan1, jan8, jan15 = (
            dt.date(2024, 1, 1),
            dt.date(2024, 1, 8),
            dt.date(2024, 1, 15),
        )
        assert out == {
            (jan1, 0): 1,
            (jan1, 2): 1,
            (jan8, 0): 1,
            (jan8, 1): 1,
        }

    def test_month_offsets(self, spark):
        rows = [
            (1, dt.datetime(2024, 1, 31)),
            (1, dt.datetime(2024, 2, 1)),  # next month -> offset 1
            (1, dt.datetime(2024, 4, 30)),  # offset 3
        ]
        out = {
            r["offset"]: r["cohort"]
            for r in retention_cohorts(
                spark.createDataFrame(rows, "user_id long, ts timestamp"),
                "user_id",
                "ts",
                period="month",
            ).collect()
        }
        assert set(out) == {0, 1, 3}
        assert all(c == dt.date(2024, 1, 1) for c in out.values())

    def test_validation(self, spark):
        df = spark.createDataFrame([], "user_id long, ts timestamp")
        with pytest.raises(ValueError, match="period"):
            retention_cohorts(df, "user_id", "ts", period="year")

    def test_matches_python_reference_on_real_events(self, spark, sf_dir):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {
            (r["cohort"], r["offset"]): r["active_users"]
            for r in retention_cohorts(ev, "user_id", "ts").collect()
        }
        raw = [
            (r["user_id"], r["ts"])
            for r in ev.select("user_id", "ts").collect()
        ]
        firsts, weeks = {}, set()
        for user, ts in raw:
            wk = (ts.date() - dt.timedelta(days=ts.weekday()))
            weeks.add((user, wk))
            if user not in firsts or wk < firsts[user]:
                firsts[user] = wk
        want = {}
        for user, wk in weeks:
            key = (firsts[user], (wk - firsts[user]).days // 7)
            want[key] = want.get(key, 0) + 1
        assert got == want
        # offset-0 rows must reproduce each cohort's full size
        cohort_sizes = {}
        for c in firsts.values():
            cohort_sizes[c] = cohort_sizes.get(c, 0) + 1
        for cohort, size in cohort_sizes.items():
            assert got[(cohort, 0)] == size


class TestPlanShape:
    def test_funnel_plan_pushes_type_filter_no_cartesian_no_udf(
        self, spark, sf_dir
    ):
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = funnel_steps(
            ev, "user_id", "ts", "event_type", STEPS, within="7 days"
        )
        buf = io.StringIO()
        import contextlib

        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "PushedFilters" in plan and "In(event_type" in plan
        assert "CartesianProduct" not in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

    def test_retention_distinct_collapses_before_join(self, spark, sf_dir):
        # the (user, period) distinct must run BEFORE the cohort join so a
        # heavy user's events collapse map-side; in the optimized plan the
        # join's left subtree therefore contains an Aggregate, and the
        # whole plan carries no window
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        df = retention_cohorts(ev, "user_id", "ts")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        join_pos = plan.find("Join")
        assert join_pos != -1
        assert "Aggregate" in plan[join_pos:], plan
        assert "Window" not in plan


class TestSessionPathNgrams:
    """operators/temporal.py:session_path_ngrams — path analysis."""

    def test_hand_built_paths_respect_session_boundaries(self, spark):
        rows = [
            # session 1 of user 1: view > click > purchase (one trigram)
            (1, _ts(1, 10, 0), "view"),
            (1, _ts(1, 10, 5), "click"),
            (1, _ts(1, 10, 9), "purchase"),
            # session 2 of user 1 (gap > 30 min): view > click only — no
            # trigram, and NO cross-session view>click>view gram either
            (1, _ts(1, 12, 0), "view"),
            (1, _ts(1, 12, 10), "click"),
            # user 2, one 4-event session: two overlapping trigrams
            (2, _ts(1, 9, 0), "view"),
            (2, _ts(1, 9, 1), "view"),
            (2, _ts(1, 9, 2), "click"),
            (2, _ts(1, 9, 3), "purchase"),
        ]
        from hbsir_old_spark.operators.temporal import session_path_ngrams

        out = {
            r["path"]: r["n_occurrences"]
            for r in session_path_ngrams(
                spark.createDataFrame(rows, EVENT_SCHEMA),
                "user_id", "ts", "event_type", gap="30 minutes", n=3,
            ).collect()
        }
        assert out == {
            "view>click>purchase": 2,
            "view>view>click": 1,
        }

    def test_short_sessions_yield_nothing(self, spark):
        from hbsir_old_spark.operators.temporal import session_path_ngrams

        rows = [(1, _ts(1), "view"), (1, _ts(1, 0, 5), "click")]
        assert (
            session_path_ngrams(
                spark.createDataFrame(rows, EVENT_SCHEMA),
                "user_id", "ts", "event_type", n=3,
            ).count()
            == 0
        )

    def test_validation(self, spark):
        from hbsir_old_spark.operators.temporal import session_path_ngrams

        df = spark.createDataFrame([], EVENT_SCHEMA)
        with pytest.raises(ValueError, match="n must be"):
            session_path_ngrams(df, "user_id", "ts", "event_type", n=1)

    def test_matches_python_reference_on_real_events(self, spark, sf_dir):
        from hbsir_old_spark.operators.temporal import session_path_ngrams

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        got = {
            r["path"]: r["n_occurrences"]
            for r in session_path_ngrams(
                ev, "user_id", "ts", "event_type",
                gap="12 hours", n=3, tiebreakers=["event_id"],
            ).collect()
        }
        raw = [
            (r["user_id"], r["ts"], r["event_id"], r["event_type"])
            for r in ev.select(
                "user_id", "ts", "event_id", "event_type"
            ).collect()
        ]
        by_user = {}
        for user, ts, eid, typ in raw:
            by_user.setdefault(user, []).append((ts, eid, typ))
        want = {}
        gap = dt.timedelta(hours=12)
        for evs in by_user.values():
            evs.sort()
            sessions, cur = [], []
            for ts, eid, typ in evs:
                if cur and ts > cur[-1][0] + gap:
                    sessions.append(cur)
                    cur = []
                cur.append((ts, eid, typ))
            sessions.append(cur)
            for s in sessions:
                types = [t for _, _, t in s]
                for i in range(len(types) - 2):
                    path = ">".join(types[i : i + 3])
                    want[path] = want.get(path, 0) + 1
        assert got == want and len(got) > 0


class TestRandomizedCrossCheck:
    """Seeded random event streams on a COARSE timestamp grid (so
    equal-timestamp collisions actually happen) — funnel, retention, and
    path n-grams each replayed against their pure-Python reference."""

    def _random_events(self, seed, n_users=12, n_events=120):
        import random

        rng = random.Random(seed)
        types = ["view", "click", "purchase", "error", "signup"]
        rows = []
        for i in range(n_events):
            rows.append(
                (
                    rng.randrange(1, n_users + 1),
                    # 20-slot grid over 3 days: dense ties + real gaps
                    dt.datetime(2024, 1, 1)
                    + dt.timedelta(hours=4 * rng.randrange(20)),
                    rng.choice(types),
                )
            )
        return rows

    @pytest.mark.parametrize("seed", [7, 23, 101])
    def test_funnel_matches_python(self, spark, seed):
        rows = self._random_events(seed)
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        got = {
            r["user_id"]: tuple(
                t
                for t in (r["step_1_ts"], r["step_2_ts"], r["step_3_ts"])
                if t is not None
            )
            for r in funnel_steps(
                df, "user_id", "ts", "event_type", STEPS, within="1 days"
            ).collect()
        }
        assert got == _python_funnel(rows, STEPS, within_days=1)

    @pytest.mark.parametrize("seed", [7, 23, 101])
    def test_retention_matches_python(self, spark, seed):
        rows = self._random_events(seed)
        df = spark.createDataFrame(rows, EVENT_SCHEMA)
        got = {
            (r["cohort"], r["offset"]): r["active_users"]
            for r in retention_cohorts(df, "user_id", "ts").collect()
        }
        firsts, weeks = {}, set()
        for user, ts, _ in rows:
            wk = ts.date() - dt.timedelta(days=ts.weekday())
            weeks.add((user, wk))
            if user not in firsts or wk < firsts[user]:
                firsts[user] = wk
        want = {}
        for user, wk in weeks:
            key = (firsts[user], (wk - firsts[user]).days // 7)
            want[key] = want.get(key, 0) + 1
        assert got == want

    @pytest.mark.parametrize("seed", [7, 23, 101])
    def test_path_ngrams_match_python(self, spark, seed):
        from hbsir_old_spark.operators.temporal import session_path_ngrams

        # unique per-row event ids make tie order deterministic in both
        # implementations (the operator's documented tiebreaker contract)
        rows = [
            (u, ts, i, typ)
            for i, (u, ts, typ) in enumerate(self._random_events(seed))
        ]
        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long, event_type string"
        )
        got = {
            r["path"]: r["n_occurrences"]
            for r in session_path_ngrams(
                df, "user_id", "ts", "event_type",
                gap="8 hours", n=2, tiebreakers=["event_id"],
            ).collect()
        }
        by_user = {}
        for u, ts, eid, typ in rows:
            by_user.setdefault(u, []).append((ts, eid, typ))
        want = {}
        gap = dt.timedelta(hours=8)
        for evs in by_user.values():
            evs.sort()
            cur = []
            sessions = []
            for ts, eid, typ in evs:
                if cur and ts > cur[-1][0] + gap:
                    sessions.append(cur)
                    cur = []
                cur.append((ts, eid, typ))
            sessions.append(cur)
            for s in sessions:
                types = [t for _, _, t in s]
                for i in range(len(types) - 1):
                    p = ">".join(types[i : i + 2])
                    want[p] = want.get(p, 0) + 1
        assert got == want
