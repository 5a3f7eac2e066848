"""Temporal joins Spark lacks natively: as-of join.

An as-of join attaches to each left row the single right row with the
greatest (backward) / smallest (forward) timestamp not beyond the left
row's, per key — the attribution/"state at time t" primitive (DuckDB and
pandas ``merge_asof`` ship it; Spark has no built-in).

Scale design: the classic sorted-merge formulation — union the two tagged
sides, one shuffle on the key, one in-partition sort on (ts, side), then a
running ``last(..., ignorenulls)`` window picks the most recent right
values for every left row. Cost is identical to any per-key window (single
Exchange + sort, no join explosion, no range-condition cross product);
both sides stream through in one pass. Hot keys behave like any skewed
window partition — pre-aggregate the right side per (key, ts) first, which
also makes ties deterministic.
"""

from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: day-time INTERVAL literal body: one or more "<int> <unit>" groups
#: (e.g. "30 minutes", "1 hour 30 minutes"). Year/month units are
#: deliberately excluded — they would make a year-month interval, which
#: cannot be added to a timestamp together with day-time units.
#: a fraction is allowed ONLY on the seconds unit — Spark's own
#: unit-list parser raises INVALID_INTERVAL_FORMAT.INVALID_FRACTION for
#: "0.5 hours"/"0.5 minutes"/even "0.5 milliseconds" (probed on 4.1)
_INTERVAL_TERM = (
    r"(?:\d+\s+(?:microsecond|millisecond|minute|hour|day|week)s?"
    r"|\d+(?:\.\d+)?\s+seconds?)"
)
_INTERVAL_RE = re.compile(
    rf"^\s*{_INTERVAL_TERM}(?:\s+{_INTERVAL_TERM})*\s*$",
    re.IGNORECASE,
)


def interval_expr(value: str, param: str) -> Column:
    """Validated ``INTERVAL`` literal. Caller-supplied strings like
    ``gap``/``within`` are interpolated into ``F.expr(f"INTERVAL ...")``;
    without this check a malformed or config-driven value becomes an
    arbitrary SQL expression (or an opaque parse error far from the call
    site). Accepts exactly the day-time forms Spark's unit-list parser
    does ("30 minutes", "1 hour 30 minutes", fractional seconds like
    "1.5 seconds" — fractions on any other unit are invalid in Spark
    too); rejects everything else with a ValueError naming the
    parameter."""
    if not isinstance(value, str) or not _INTERVAL_RE.match(value):
        raise ValueError(
            f"{param} must be a day-time INTERVAL literal like '30 minutes' "
            f"or '1 hour 30 minutes', got {value!r}"
        )
    return F.expr(f"INTERVAL {value}")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by_cols: Sequence[str],
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row, plus the ``value_cols`` of the
    matching right row (NULL where no right row qualifies).

    ``direction="backward"`` matches the latest right ts <= left ts
    (inclusive, like DuckDB ASOF and pandas merge_asof); ``"forward"``
    matches the earliest right ts >= left ts. ``tolerance_s`` voids
    matches farther than that many seconds from the left timestamp.
    Right value columns that collide with a left column name get
    ``suffix``; the matched right timestamp is exposed as
    ``ts_col + suffix``.

    Ties on (key, ts) within the right side resolve to the row the sort
    places last — pre-aggregate the right side per (key, ts) for
    deterministic output.

    NULL keys never match (DuckDB ASOF / pandas merge_asof equi-join
    semantics): right rows with a NULL in any ``by_cols`` column are
    dropped, and left rows with a NULL key come through with NULL match
    columns. (``Window.partitionBy`` alone would group NULLs together and
    happily match NULL to NULL.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    by_cols = list(by_cols)
    for c in by_cols:
        # NULL-key right rows can only ever produce the NULL==NULL matches
        # we must not emit, so remove them before the union
        right = right.filter(F.col(c).isNotNull())
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (*by_cols, ts_col)]
    out_names = {
        c: f"{c}{suffix}" if c in left.columns else c for c in value_cols
    }
    rts = f"{ts_col}{suffix}"
    if rts in out_names.values():
        # the matched-row struct would carry two fields of this name and
        # every downstream reference would be ambiguous
        raise ValueError(
            f"right column {rts!r} collides with the matched-timestamp output "
            f"column (ts_col {ts_col!r} + suffix {suffix!r}); rename it or "
            "pass a different suffix"
        )

    # union the tagged sides on an aligned schema: left rows carry their
    # payload and a NULL right-row struct, right rows the reverse. The
    # right values ride as ONE struct so the window picks a whole right row
    # atomically — per-column last(ignorenulls) would skip a NULL field of
    # the nearest right row and stitch it together with an older row's
    # value (a row that never existed).
    null = F.lit(None)
    rrow_type = (
        "struct<"
        + ", ".join(
            [f"`{out_names[c]}`:{right.schema[c].dataType.simpleString()}" for c in value_cols]
            + [f"`{rts}`:{right.schema[ts_col].dataType.simpleString()}"]
        )
        + ">"
    )
    l_tagged = left.select(
        *by_cols,
        F.col(ts_col).alias("__ts__"),
        F.lit(1).alias("__side__"),
        *[F.col(c) for c in left.columns if c not in (*by_cols, ts_col)],
        null.cast(rrow_type).alias("__rrow__"),
    )
    r_tagged = right.select(
        *by_cols,
        F.col(ts_col).alias("__ts__"),
        F.lit(0).alias("__side__"),
        *[
            null.cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in (*by_cols, ts_col)
        ],
        F.struct(
            *[F.col(c).alias(out_names[c]) for c in value_cols],
            F.col(ts_col).alias(rts),
        ).cast(rrow_type).alias("__rrow__"),
    )
    combined = l_tagged.unionByName(r_tagged)

    # backward: ascending ts, right (side 0) sorts before left at equal ts,
    # so the inclusive match is the running last non-null right row struct;
    # forward is the mirror image
    order: list[Column] = (
        [F.col("__ts__").asc(), F.col("__side__").asc()]
        if direction == "backward"
        else [F.col("__ts__").desc(), F.col("__side__").asc()]
    )
    win = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = combined.select(
        "*", F.last("__rrow__", ignorenulls=True).over(win).alias("__m__")
    )
    result = matched.filter(F.col("__side__") == 1)
    within = (
        F.lit(True)
        if tolerance_s is None
        else (
            F.abs(
                F.unix_millis(F.col("__ts__"))
                - F.unix_millis(F.col("__m__")[rts])
            )
            <= F.lit(int(tolerance_s * 1000))
        )
    )
    keep_left = [c for c in left.columns if c not in (*by_cols, ts_col)]
    return result.select(
        *by_cols,
        F.col("__ts__").alias(ts_col),
        *keep_left,
        *[
            F.when(within, F.col("__m__")[out_names[c]]).alias(out_names[c])
            for c in value_cols
        ],
        F.when(within, F.col("__m__")[rts]).alias(rts),
    )


_ROLLING_AGGS = {
    "avg": F.avg,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    "count": F.count,
}


def rolling_aggregate(
    df: DataFrame,
    partition_by: str | Sequence[str],
    order_by: str,
    value_col: str,
    window: int,
    agg: str = "avg",
    tiebreakers: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Trailing rolling aggregate over the last ``window`` rows per key —
    the time-series smoothing primitive (pandas ``rolling(window)``; the
    reference's pandas post-processing idiom, e.g. api.py consumers
    smoothing yearly series).

    One Exchange on ``partition_by`` + one in-partition sort; the frame is
    ``rowsBetween(-(window-1), 0)`` so Spark keeps a bounded ring buffer
    per partition — no unbounded state, no second shuffle. Pass
    ``tiebreakers`` (e.g. the event id) whenever ``order_by`` can tie:
    a non-deterministic frame order makes the result run-dependent.
    """
    if agg not in _ROLLING_AGGS:
        raise ValueError(f"unknown rolling agg {agg!r}")
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_by, *tiebreakers)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    name = out_col or f"rolling_{agg}_{value_col}"
    return df.withColumn(name, _ROLLING_AGGS[agg](value_col).over(w))


def sessionize_batch(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    tiebreakers: Sequence[str] = (),
    session_col: str = "session_id",
) -> DataFrame:
    """Batch sessionization (gaps-and-islands): assign each row a per-user
    session ordinal, where a new session starts when the gap to the
    previous event exceeds ``gap``. The batch twin of the engine's
    streaming ``sessionize`` (streaming/events.py) — same session
    semantics, replayable over history.

    Classic two-window formulation over ONE shuffle: both windows hash by
    ``user_col`` and sort by (ts, tiebreakers), so Catalyst reuses a single
    Exchange + sort for the lag and the running sum. The boundary is
    exclusive (gap strictly greater starts a new session), matching
    Spark's session_window semantics.

    ``gap`` grammar (validated by :func:`interval_expr`): one or more
    ``"<int> <unit>"`` terms with FULL unit names — ``microsecond(s)
    millisecond(s) second(s) minute(s) hour(s) day(s) week(s)`` — e.g.
    ``"30 minutes"`` or ``"1 hour 30 minutes"``; a fraction only on
    seconds (Spark's own rule); no year/month units, no abbreviations
    (``"30m"``), no negatives (a negative session gap is meaningless).
    """
    gap_expr = interval_expr(gap, "gap")
    order = [ts_col, *tiebreakers]
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    new_session = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), 1
    ).otherwise(0)
    running = (
        Window.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(session_col, F.sum(new_session).over(running).cast("long"))


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: str | None = None,
) -> DataFrame:
    """Strict-order funnel: per user, step ``i`` is reached at the EARLIEST
    event of type ``steps[i]`` occurring STRICTLY AFTER the step ``i-1``
    reach time; optionally every later step must land ``within`` an
    INTERVAL of the step-1 time (the classic conversion window, inclusive
    at the deadline; grammar as documented on :func:`sessionize_batch` —
    full day-time unit names only, positive, validated by
    :func:`interval_expr`). Returns one row per user who reached step 1, with
    columns ``user_col, step_1_ts .. step_k_ts`` — NULL from the first
    stalled step onward (a stalled funnel can never resume: step i+1
    filters on step i's timestamp, and ``ts > NULL`` is never true).

    Scale shape — k-pass iterative min-aggregation, NOT per-user
    ``collect_list`` + fold: each pass filters the event stream to ONE
    step type (predicate pushes to the scan), shuffles only those rows on
    ``user_col``, and partial-aggregates ``min(ts)`` map-side, so per-user
    state is O(1) throughout — a bot user with 10^8 events costs a bigger
    partial agg, never executor memory. The per-pass join's right side is
    at most one row per step-1 user (already aggregated), so AQE sizes it
    (broadcast when small). k passes over a pre-filtered stream beats one
    pass that materializes every user's event array.

    Reference analogue: none (beyond-reference events-analytics operator).
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {list(steps)}")
    base = df.filter(F.col(type_col).isin(list(steps))).select(
        user_col, ts_col, type_col
    )
    reached = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("step_1_ts"))
    )
    deadline = (
        F.col("step_1_ts") + interval_expr(within, "within") if within else None
    )
    for i, step in enumerate(steps[1:], start=2):
        # ONE left join + conditional min-agg per pass (r14, guide §2.4):
        # the original shape consumed `reached` twice (an inner join to
        # apply the step-i condition, then an outer join to re-attach
        # non-converting users), and Spark shares no subtrees across
        # consumers, so step k re-executed step 1's aggregation ~2^(k-1)
        # times — the 3-step gate's executed plan carried 7 event scans
        # where the k-pass design promises 3. Fusing the condition into
        # `min(when(cond, ts))` over a LEFT join keeps every step-1 user
        # in one linear chain: `reached` is consumed once, no
        # materialization is needed, and each pass adds exactly one
        # Exchange (the step-i event sliver) — the reached side and the
        # re-aggregation ride the previous pass's user partitioning.
        # Semantics identical: a user with no qualifying step-i event
        # aggregates min(NULL) = NULL, exactly the old outer join's miss;
        # a stalled user (step_{i-1}_ts NULL) makes cond NULL, same NULL
        # cascade as before. Per-user state stays O(1) (partial min).
        evs = base.filter(F.col(type_col) == step).select(user_col, ts_col)
        cond = F.col(ts_col) > F.col(f"step_{i - 1}_ts")
        if deadline is not None:
            cond = cond & (F.col(ts_col) <= deadline)
        prev_cols = [f"step_{j}_ts" for j in range(1, i)]
        reached = (
            reached.join(evs, user_col, "left")
            .groupBy(user_col, *prev_cols)
            .agg(F.min(F.when(cond, F.col(ts_col))).alias(f"step_{i}_ts"))
        )
    return reached


def funnel_counts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: ``(step_index, step_name, users, conversion)`` —
    users reaching each step of :func:`funnel_steps` and the fraction of
    step-1 users still converting (rounded to 4 places; 0 rows in → the
    k rows report 0 users, conversion NULL).

    One extra single-row aggregation over the per-user frame (count of
    each ``step_i_ts``), then a k-element inline stack — no second pass
    over the event stream, no window (conversion divides inside the one
    agg row, where the step-1 count is a sibling column), and nothing
    wider than k columns ever moves.
    """
    per_user = funnel_steps(df, user_col, ts_col, type_col, steps, within)
    counts = per_user.agg(
        *[
            F.count(f"step_{i}_ts").cast("long").alias(f"c{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("step_index"),
                F.lit(step).alias("step_name"),
                F.col(f"c{i}").alias("users"),
                # try_divide: 0 step-1 users -> NULL conversion under ANSI
                F.round(F.try_divide(F.col(f"c{i}"), F.col("c1")), 4).alias(
                    "conversion"
                ),
            )
            for i, step in enumerate(steps, start=1)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention: cohort = the ``period`` (``week``/``day``/
    ``month``) containing the user's FIRST event; a user is active at
    offset ``n`` if they have any event in the period ``n`` whole periods
    after their cohort period. Returns ``(cohort, offset, active_users)``
    with ``cohort`` a DATE (Monday for weeks, the 1st for months); offset
    0 is the cohort period itself, so every cohort's offset-0 row counts
    its full size.

    Scale shape: two partial aggregations + one user-keyed join — never a
    window, never per-user state. ``min(ts)`` per user map-combines; the
    distinct (user, period) activity set map-combines the same way (a
    user's million events in a week collapse to one row before the
    shuffle); the join carries at most |users| × |periods| rows; the final
    (cohort, offset) rollup is a plain partial-agg count over an already-
    distinct frame (deliberately NOT countDistinct's expand).

    Reference analogue: none (beyond-reference events-analytics operator).
    """
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day|week|month, got {period!r}")
    first = df.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).cast("date").alias("cohort")
    )
    activity = df.select(
        user_col, F.date_trunc(period, ts_col).cast("date").alias("__period__")
    ).distinct()
    if period == "day":
        offset = F.datediff("__period__", "cohort")
    elif period == "week":
        offset = (F.datediff("__period__", "cohort") / 7).cast("int")
    else:
        offset = F.months_between("__period__", "cohort").cast("int")
    return (
        activity.join(first, user_col)
        .select("cohort", offset.cast("int").alias("offset"))
        .groupBy("cohort", "offset")
        .agg(F.count("*").cast("long").alias("active_users"))
    )


def session_path_ngrams(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    gap: str = "30 minutes",
    n: int = 3,
    tiebreakers: Sequence[str] = (),
    sep: str = ">",
) -> DataFrame:
    """Path analysis: frequency of every length-``n`` consecutive
    event-type sequence within a session (sessions per
    :func:`sessionize_batch`, same ``gap`` semantics). Returns
    ``(path, n_occurrences)`` — the "what do users do in what order"
    primitive behind sankey/path reports.

    Scale shape: one Exchange for sessionization (both windows share it),
    one (user, session) aggregation whose per-group state is a single
    session's events — bounded by the session ``gap``, not by user
    history (a bot's year of events still splits into gap-bounded
    sessions) — then a map-only JVM n-gram explode (``sequence`` +
    ``slice`` + ``concat_ws``; the ``sequence(1, size-n+1)`` call is
    guarded against the descending-sequence trap for short sessions) and
    a partial-agg count. Sorting inside ``array_sort(collect_list(
    struct(ts, *tiebreakers, type)))`` keeps the per-session order
    deterministic when timestamps tie — pass the event id.

    Reference analogue: none (beyond-reference events-analytics operator).
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    sess = sessionize_batch(
        df, user_col, ts_col, gap=gap, tiebreakers=tiebreakers
    )
    order_struct = F.struct(ts_col, *tiebreakers, type_col)
    seqs = (
        sess.groupBy(user_col, "session_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(order_struct)),
                lambda s: s[type_col],
            ).alias("__seq__")
        )
        .filter(F.size("__seq__") >= n)  # guards sequence(1, <1) below
    )
    grams = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__seq__") - (n - 1)),
                lambda i: F.concat_ws(sep, F.slice("__seq__", i, n)),
            )
        ).alias("path")
    )
    return grams.groupBy("path").agg(
        F.count("*").cast("long").alias("n_occurrences")
    )
