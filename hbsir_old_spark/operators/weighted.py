"""Weighted averages (reference parity: A3/A4,
/root/reference/hbsir/calculator/average.py:8-112).

The reference computes per-group weighted means with
``groupby().apply(weighted_average)`` — a Python loop per group. Here the
whole thing is ONE shuffle-free-as-possible aggregation:
``sum(x*w)/sum(w)`` per column inside a single ``groupBy().agg`` — map-side
partial aggregation, whole-stage codegen, no per-group Python. At 100 TB this
is a single shuffle on the grouping key with partial combines; skew is
handled by AQE.

The reference's unweighted bug (assigning the literal string column name as
the weight, average.py:98-99) is intentionally NOT replicated: ``weighted=
False`` means weight ≡ 1.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: groupers auto-detected by average_table, mirroring
#: /root/reference/hbsir/config/default_settings.yaml:93-99
DEFAULT_GROUPERS = ("Year", "Urban_Rural", "Province", "County", "Decile", "Percentile")

_NUMERIC_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _numeric_columns(df: DataFrame, exclude: Iterable[str]) -> list[str]:
    excluded = {c.lower() for c in exclude}
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, _NUMERIC_TYPES) and f.name.lower() not in excluded
    ]


def weighted_average(
    df: DataFrame,
    weight_col: str = "Weight",
    value_cols: Sequence[str] | None = None,
    group_cols: Sequence[str] = (),
    exclude_cols: Sequence[str] = ("ID", "Member_Number"),
) -> DataFrame:
    """Per-group weighted mean of every (selected) numeric column.

    Semantics: ``sum(x * w) / sum(w restricted to rows where x is not null)``
    — matching pandas' null handling where a null value contributes neither
    numerator nor denominator for that column.
    """
    if value_cols is None:
        value_cols = _numeric_columns(df, exclude=(*group_cols, weight_col, *exclude_cols))
    w = F.col(weight_col)
    aggs = [
        (
            F.sum(F.col(c) * w)
            / F.sum(F.when(F.col(c).isNotNull(), w))
        ).alias(c)
        for c in value_cols
    ]
    if not aggs:
        raise ValueError("no numeric value columns to average")
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def average_table(
    df: DataFrame,
    value_cols: Sequence[str] | None = None,
    weight_col: str = "Weight",
    groupby: Sequence[str] | None = None,
    weighted: bool = True,
) -> DataFrame:
    """Grouped weighted average with auto-detected groupers (reference A4).

    Groupers default to the intersection of :data:`DEFAULT_GROUPERS` with the
    table's columns. ``weighted=False`` uses weight 1 for every row (the
    reference's intent; its implementation bug is documented in SURVEY §2.5).
    """
    if groupby is None:
        groupby = [c for c in DEFAULT_GROUPERS if c in df.columns]
    if not weighted:
        df = df.withColumn("__unit_weight__", F.lit(1.0))
        weight_col = "__unit_weight__"
    return weighted_average(df, weight_col, value_cols, group_cols=groupby)
