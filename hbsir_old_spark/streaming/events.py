"""Event-stream operators: tumbling / sliding / session windows.

The reference has no streaming (SURVEY §2.10); this is the engine's
Structured-Streaming extension. Each transformation is written against a
plain DataFrame so the SAME function runs in batch (for the DuckDB oracle
gate) and on a ``readStream`` source (tests exercise both). For streaming
use, call ``with_watermark=...`` so state is bounded and late data beyond
the watermark is dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hbsir_old_spark.operators.temporal import interval_expr


def _maybe_watermark(df: DataFrame, ts_col: str, with_watermark: str | None) -> DataFrame:
    return df.withWatermark(ts_col, with_watermark) if with_watermark else df


def tumbling_stats(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    with_watermark: str | None = None,
) -> DataFrame:
    """Per event-type counts and value sums over tumbling windows."""
    df = _maybe_watermark(events, ts_col, with_watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    with_watermark: str | None = None,
) -> DataFrame:
    """Sliding-window event counts (window/slide)."""
    df = _maybe_watermark(events, ts_col, with_watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    with_watermark: str | None = None,
) -> DataFrame:
    """Per-user sessions: events closer than ``gap`` merge into one session.
    Uses the native session_window state operator — in streaming mode this
    is incremental per-key state with watermark-based eviction; in batch it
    is the classic gaps-and-islands computation (the DuckDB oracle expresses
    it with lag + cumulative sum)."""
    df = _maybe_watermark(events, ts_col, with_watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), user_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col(user_col),
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    within: str = "30 minutes",
    left_watermark: str | None = None,
    right_watermark: str | None = None,
    right_suffix: str = "_r",
) -> DataFrame:
    """Event-pair (stream-stream capable) interval join: each left event
    pairs with the right events of the same key whose timestamp falls in
    ``(left.ts, left.ts + within]`` — the click→conversion attribution
    primitive. ``within`` grammar (validated by
    :func:`~hbsir_old_spark.operators.temporal.interval_expr`): one or
    more ``"<int> <unit>"`` terms with full day-time unit names
    (``seconds``/``minutes``/``hours``/``days``/``weeks``/...), fraction
    only on seconds, positive only — no year/month units, no
    abbreviations, no negatives (the window is forward by construction).

    The same call runs in batch (equi+range join; Spark plans a hash join
    on the key with the range as a post-filter — no cross product) and on
    two ``readStream`` sources, where BOTH watermarks plus the closed
    time-range condition let Spark bound join state and evict rows older
    than the watermark (the canonical stream-stream join recipe from the
    Structured Streaming guide). Right columns (except the key) come back
    suffixed with ``right_suffix``.
    """
    l = _maybe_watermark(left, ts_col, left_watermark)
    r = _maybe_watermark(right, ts_col, right_watermark)
    renames = {c: c + right_suffix for c in r.columns if c != key_col}
    r = r.select(
        key_col, *[F.col(c).alias(n) for c, n in renames.items()]
    )
    rts = ts_col + right_suffix
    cond = (
        (l[key_col] == r[key_col])
        & (F.col(rts) > F.col(ts_col))
        & (F.col(rts) <= F.col(ts_col) + interval_expr(within, "within"))
    )
    return l.join(r, cond).drop(r[key_col])
