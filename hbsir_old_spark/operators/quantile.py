"""Weighted empirical quantiles, deciles, percentiles (reference parity:
W1-W3, /root/reference/hbsir/calculator/quantile.py:119-270; binning P15
quantile.py:194-203).

The reference sorts each group and takes ``cumsum(weight) / sum(weight)`` —
a right-closed weighted ECDF in (0, 1]. Spark formulation: one window
partitioned by the group keys, ordered by value with a deterministic
tiebreaker, frame ``rowsBetween(unboundedPreceding, currentRow)`` — this
reproduces pandas' row-distinct quantiles for tied values (rangeBetween
would give tie-grouped ECDF, a different semantic; see SURVEY §2.6 W1).

Scale note: a window over ``partitionBy(Year[, attrs])`` shuffles once on the
group key and sort-spills within partitions — the same cost profile as any
global-order statistic. For very hot groups at 100 TB, range-repartition by
(group, value) first; semantics are unchanged.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def weighted_ecdf(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    group_cols: Sequence[str] = (),
    out_col: str = "Quantile",
    tiebreaker_cols: Sequence[str] = (),
    drop_null_values: bool = True,
) -> DataFrame:
    """Add ``out_col`` = right-closed weighted ECDF of ``value_col`` within
    each group. ``weight_col=None`` means equal weights (rank / n).

    ``tiebreaker_cols`` pins the order of tied values so results are
    deterministic (the reference leaves tie order unspecified; we document
    and pin it — SURVEY §7.3).
    """
    if drop_null_values:
        df = df.filter(F.col(value_col).isNotNull())
    w: Column = F.lit(1.0) if weight_col is None else F.col(weight_col)
    order = [F.col(value_col), *[F.col(c) for c in tiebreaker_cols]]
    win_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_all = Window.partitionBy(*group_cols)
    return df.withColumn(out_col, F.sum(w).over(win_cum) / F.sum(w).over(win_all))


def add_quantile_bin(
    df: DataFrame,
    quantile_col: str = "Quantile",
    bins: int = 10,
    out_col: str = "Decile",
) -> DataFrame:
    """Bin an ECDF value into 1..bins: ``floor(q*bins)+1`` clipped to
    [1, bins] (reference P15)."""
    raw = F.floor(F.col(quantile_col) * bins) + 1
    clipped = F.least(F.greatest(raw, F.lit(1)), F.lit(bins))
    return df.withColumn(out_col, clipped.cast("int"))


def add_decile(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    group_cols: Sequence[str] = (),
    out_col: str = "Decile",
    tiebreaker_cols: Sequence[str] = (),
) -> DataFrame:
    """W1 + P15 with bins=10."""
    with_q = weighted_ecdf(df, value_col, weight_col, group_cols, "__q__", tiebreaker_cols)
    return add_quantile_bin(with_q, "__q__", 10, out_col).drop("__q__")


def add_percentile(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    group_cols: Sequence[str] = (),
    out_col: str = "Percentile",
    tiebreaker_cols: Sequence[str] = (),
) -> DataFrame:
    """W1 + P15 with bins=100."""
    with_q = weighted_ecdf(df, value_col, weight_col, group_cols, "__q__", tiebreaker_cols)
    return add_quantile_bin(with_q, "__q__", 100, out_col).drop("__q__")
