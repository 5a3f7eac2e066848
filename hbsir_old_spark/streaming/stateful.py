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
