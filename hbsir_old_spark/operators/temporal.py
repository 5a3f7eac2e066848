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

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    Exchange + sort for the lag and the running sum. ``gap`` is any Spark
    INTERVAL literal; the boundary is exclusive (gap strictly greater
    starts a new session), matching Spark's session_window semantics.
    """
    gap_expr = F.expr(f"INTERVAL {gap}")
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
