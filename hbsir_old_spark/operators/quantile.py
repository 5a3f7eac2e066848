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


def approx_quantile_breaks(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate per-group quantile break values via Spark's
    Greenwald-Khanna sketch (``approx_percentile``): one partial-aggregable
    pass, no global sort. Returns one row per group with
    ``breaks`` = array of bins-1 inner break points.

    This is the 100-TB twin of :func:`weighted_ecdf` + binning: the exact
    window formulation totally orders each group (one shuffle + full sort,
    fine up to hot-group sizes), while the sketch keeps O(1/eps) state per
    group and merges map-side — the standard trade once groups outgrow a
    partition sort. Unweighted (the sketch has no weight notion; for
    survey-weighted deciles use the exact path)."""
    probs = [i / bins for i in range(1, bins)]
    agg = F.expr(
        f"approx_percentile({value_col}, array({', '.join(map(str, probs))}), "
        f"{int(1 / relative_error)})"
    ).alias("breaks")
    return df.groupBy(*group_cols).agg(agg) if group_cols else df.agg(agg)


def add_approx_bin(
    df: DataFrame,
    value_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    out_col: str = "Decile",
    relative_error: float = 0.001,
) -> DataFrame:
    """Assign each row its approximate ``bins``-quantile bin: compute the
    per-group sketch breaks once, broadcast them back (groups are
    dim-cardinality), and bin map-side — the row side never sorts and never
    shuffles beyond the sketch's own partial aggregation."""
    breaks = approx_quantile_breaks(df, value_col, bins, group_cols, relative_error)
    joined = (
        df.join(F.broadcast(breaks), on=list(group_cols))
        if group_cols
        else df.crossJoin(F.broadcast(breaks))
    )
    # bin = 1 + number of breaks strictly below the value (array expression,
    # codegen-friendly, no per-row loop in Python)
    bin_col = F.lit(1) + F.size(
        F.filter(F.col("breaks"), lambda b: b < F.col(value_col))
    )
    return joined.withColumn(out_col, bin_col.cast("int")).drop("breaks")
