"""Custom stateful streaming operators via ``applyInPandasWithState``.

These cover semantics the built-in window operators cannot express:
arbitrary per-key state evolved across micro-batches, Arrow-batched. State
is a fixed struct per key; watermark-driven timeouts bound its lifetime.
Used sparingly — everything expressible with window/session aggregations
stays in `events.py` (JVM-side).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CUM_OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double"
CUM_STATE_SCHEMA = "n long, s double"


def _cumulative_fn(
    key: Tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        s += float(pdf["value"].fillna(0.0).sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def cumulative_user_stats(events: DataFrame) -> DataFrame:
    """Running per-user totals across the whole stream — state persists
    between micro-batches (output mode: update). Works identically on a
    bounded batch DataFrame grouped the same way."""
    return events.groupBy("user_id").applyInPandasWithState(
        _cumulative_fn,
        outputStructType=CUM_OUTPUT_SCHEMA,
        stateStructType=CUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_funnel(
    events: DataFrame,
    steps: list[str],
    within_ms: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming twin of the batch strict-order funnel
    (operators/temporal.py:funnel_steps): per-user funnel state evolved
    across micro-batches. Emits ``(user, step_reached, step_1_ms,
    last_step_ms)`` in update mode whenever a user's batch carries funnel
    events; ``within_ms`` bounds later steps to a window anchored at the
    step-1 time (inclusive deadline, same as the batch ``within``).

    Semantics: events are sorted by timestamp WITHIN each micro-batch
    before folding, so a bounded replay in timestamp order (or any
    single-batch replay) reproduces the batch funnel EXACTLY — the greedy
    in-order fold advances at precisely the batch formulation's
    min-qualifying timestamp, and ties are immaterial because the strict
    '>' both engines share skips equal timestamps either way. Cross-batch
    reordering is the documented caveat: an event arriving in a later
    micro-batch with a timestamp before already-advanced state is ignored
    (the stream-processing trade-off every funnel system makes; bound it
    upstream with a watermark-sized buffer if late data matters).

    Scale shape: the JVM side filters to the k funnel types (predicate
    pushed to the source) and ships only (user, ms, type) through Arrow;
    per-user state is THREE scalars regardless of history length, and the
    per-call pandas frame is one user's funnel-type events in ONE
    micro-batch (bounded by the trigger interval, not by history).
    """
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {list(steps)}")
    if within_ms is not None and within_ms <= 0:
        raise ValueError(f"within_ms must be positive, got {within_ms}")

    from pyspark.sql import functions as F

    user_type = events.schema[user_col].dataType.simpleString()
    output_schema = (
        f"{user_col} {user_type}, step_reached int,"
        " step_1_ms long, last_step_ms long"
    )
    state_schema = "step int, t1 long, last long"
    n_steps = len(steps)

    def fn(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user,) = key
        step, t1, last = state.get if state.exists else (0, None, None)
        pdf = pd.concat(list(batches), ignore_index=True)
        pdf = pdf.sort_values("__ms__", kind="mergesort")
        for ms, typ in zip(pdf["__ms__"], pdf[type_col]):
            if step >= n_steps:
                break
            if typ != steps[step]:
                continue
            ms = int(ms)
            if step == 0:
                t1 = last = ms
                step = 1
            elif within_ms is not None and ms > t1 + within_ms:
                break  # deadline passed; later qualifying events are later still
            elif ms > last:
                last = ms
                step += 1
        state.update((step, t1, last))
        if step >= 1:
            yield pd.DataFrame(
                {
                    user_col: [user],
                    "step_reached": [step],
                    "step_1_ms": [t1],
                    "last_step_ms": [last],
                }
            )

    # NULL timestamps are dropped JVM-side to match the batch twin (its
    # min(ts)/strict-'>' comparisons skip NULLs); without this, NaN in
    # the Arrow frame would crash int() inside the state function and
    # poison checkpoint restarts of the same batch
    prepped = events.filter(
        F.col(type_col).isin(list(steps)) & F.col(ts_col).isNotNull()
    ).select(
        F.col(user_col),
        F.unix_millis(F.col(ts_col)).alias("__ms__"),
        F.col(type_col),
    )
    return prepped.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
