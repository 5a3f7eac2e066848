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

from hbsir_old_spark.session import ensure_min_partitions


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


def _count_lt(arr: Column, length: int, v: Column) -> Column:
    """#elements of the sorted ``arr`` (static ``length``) strictly below
    ``v``, as an UNROLLED binary-search CASE tree — O(log n) comparisons
    per row inside whole-stage codegen. The higher-order alternative
    (``size(filter(arr, p -> p < v))``) evaluates its lambda interpreted,
    element by element — measured ~5x slower end-to-end on a 161-probe
    array over 600k rows. NULL v falls through every branch and returns
    ``length``; callers mask NULL values themselves."""

    def first_ge(lo: int, hi: int) -> Column:
        if lo > hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        return F.when(
            F.element_at(arr, mid) >= v, first_ge(lo, mid - 1)
        ).otherwise(first_ge(mid + 1, hi))

    return first_ge(1, length) - 1


def _join_groups_broadcast(
    left: DataFrame, right: DataFrame, group_cols: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Broadcast-join per-group rows back onto the fact side, NULL-safely:
    ``on=group_cols`` uses null-rejecting equality and would silently drop
    every NULL-group row, while the exact path's ``Window.partitionBy``
    treats NULL as an ordinary group. ``eqNullSafe`` keys keep the
    broadcast hash join."""
    if not group_cols:
        how_cross = "cross" if how == "inner" else how
        if how_cross == "cross":
            return left.crossJoin(F.broadcast(right))
        return left.join(F.broadcast(right), F.lit(True), how)
    # rename the right-side keys first: right derives from left, so
    # left[c]/right[c] references trip the ambiguous-self-join check
    for c in group_cols:
        right = right.withColumnRenamed(c, f"__g_{c}__")
    cond = None
    for c in group_cols:
        clause = F.col(c).eqNullSafe(F.col(f"__g_{c}__"))
        cond = clause if cond is None else cond & clause
    return left.join(F.broadcast(right), cond, how).drop(
        *[f"__g_{c}__" for c in group_cols]
    )


def weighted_approx_quantile_breaks(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    probes: int | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate per-group WEIGHTED quantile breaks without a global sort
    (the survey-weighted semantics of reference quantile.py:119-146, which
    the unweighted GK sketch in :func:`approx_quantile_breaks` can't carry).

    Two partial-aggregable passes:

    1. an UNWEIGHTED Greenwald-Khanna probe grid per group — ``probes``
       value-candidates spanning the distribution (plus min/max), so break
       positions can only land where data actually is;
    2. the EXACT weighted CDF at every probe — per probe j,
       ``sum(weight * (value <= probe_j)) / sum(weight)`` — one plain
       groupBy over codegen'd conditional sums (map-side combine applies;
       the shuffle carries one (probes+1)-column row per group per map
       partition).

    The weighted break for target quantile q is then the first probe whose
    weighted CDF reaches q. The CDF values are exact; the only
    approximation is that breaks snap to the probe grid, so the error is
    bounded by the largest weight mass between adjacent unweighted
    1/probes-quantiles. Returns one row per group:
    (group_cols..., breaks array<double> of bins-1 inner break values).

    NULL values are dropped up front (mirroring :func:`weighted_ecdf`'s
    default) — otherwise their weight would inflate the CDF denominator
    while reaching no probe, capping every CDF below 1 and leaving high
    quantiles without a crossing. NULL group keys form their own group,
    as they do under ``Window.partitionBy`` in the exact path.

    Measured dead end (round 5, do not repeat): assembling the CDF +
    interpolation DRIVER-SIDE from collected per-group histograms looks
    cheaper (the one-row expression tree costs ~2-3 s of Catalyst
    analysis/codegen on the first call) but is ~1.8x slower end-to-end at
    sf0.1 — the expression formulation amortizes through Spark's codegen
    cache on repeat calls, while eager hist/grid collects pay two full
    synchronous scan jobs every call instead of fusing into the caller's
    single job.
    """
    df = ensure_min_partitions(df).filter(F.col(value_col).isNotNull())
    # default grid: 16 probes per requested bin, floored at 64; capped only
    # as a guard against absurd bins values (the per-group CDF assembly is
    # a linear running-sum fold on ONE row per group)
    n_probes = probes or max(64, min(bins * 16, 2048))
    probe_qs = [i / n_probes for i in range(1, n_probes)]
    sketch = F.expr(
        f"approx_percentile({value_col}, array({', '.join(map(str, probe_qs))}), "
        f"{int(1 / relative_error)})"
    )
    grid_aggs = [
        F.concat(
            F.array(F.min(value_col).cast("double")),
            sketch.cast("array<double>"),
            F.array(F.max(value_col).cast("double")),
        ).alias("__probes__")
    ]
    grid = (
        df.groupBy(*group_cols).agg(*grid_aggs) if group_cols else df.agg(*grid_aggs)
    )
    # The grid feeds TWO broadcast joins below (row binning + CDF assembly).
    # Left lazy, each join embeds its own copy of the GK subtree and the
    # dominant full-data sketch pass runs twice — canonicalized-exchange
    # reuse is not guaranteed (measured ReusedExchange=0 on this shape).
    # The grid is one short row per group, so materializing it eagerly is
    # ~free and pins exactly one sketch pass + one histogram pass over the
    # fact. Same executor-loss caveat as the dedup band table
    # (dedup.py:399-401): use a reliable checkpoint dir on real clusters.
    grid = grid.localCheckpoint(eager=True)
    joined = _join_groups_broadcast(df, grid, group_cols)
    w = F.col(weight_col).cast("double")
    n_cols = n_probes + 1  # min + (n_probes-1) sketch points + max
    # Weighted CDF via a HISTOGRAM aggregation, not one conditional sum per
    # probe: n_probes+1 sum columns in a single agg blows Spark's generated-
    # method size limits and drops the whole aggregation to interpreted
    # evaluation (measured 10x slower). Instead each row computes its
    # bucket = #probes strictly below the value (one codegen'd array scan),
    # a narrow (group, bucket) sum shuffles at most probes+1 rows per group
    # per partition, and the per-group CDF assembles from that tiny
    # histogram with array expressions on one row per group.
    bucket = _count_lt(
        F.col("__probes__"), n_cols, F.col(value_col).cast("double")
    )
    hist = joined.groupBy(*group_cols, bucket.alias("__i__")).agg(
        F.sum(w).alias("__hw__")
    )
    gm = (
        hist.groupBy(*group_cols) if group_cols else hist.groupBy()
    ).agg(
        F.map_from_entries(F.collect_list(F.struct("__i__", "__hw__"))).alias("__m__"),
        F.sum("__hw__").alias("__tw__"),
    )
    agg = _join_groups_broadcast(gm, grid, group_cols)
    # bucket weights 0..n_cols (empty buckets -> 0), then CDF at probe j =
    # sum of buckets 0..j-1 over total: value <= probes[j] iff fewer than j
    # probes sit strictly below it
    agg = agg.withColumn(
        "__bw__",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_cols)),
            lambda j: F.coalesce(F.element_at(F.col("__m__"), j), F.lit(0.0)),
        ),
    )
    # one linear fold builds the prefix sums (a per-j slice+fold would be
    # O(probes^2) per group); prefix[j+1] = sum of buckets 0..j-1, so
    # CDF at probe j = prefix[j+1] / total
    prefix = F.aggregate(
        F.col("__bw__"),
        F.array(F.lit(0.0)),
        lambda acc, x: F.concat(acc, F.array(F.element_at(acc, -1) + x)),
    )
    agg = agg.withColumn("__prefix__", prefix)
    cdfs = F.transform(
        F.sequence(F.lit(1), F.lit(n_cols)),
        lambda j: F.element_at(F.col("__prefix__"), j + 1) / F.col("__tw__"),
    )
    agg = agg.withColumn("__cdfs__", cdfs)
    cdfs = F.col("__cdfs__")
    # break for q=i/bins: linearly interpolate between the bracketing probes
    # (p_lo, cdf_lo) and (p_hi, cdf_hi) where the weighted CDF crosses q —
    # snapping to the grid alone leaves a half-probe-gap bias; interpolation
    # (uniform-density-within-gap assumption) recovers most of it. The final
    # probe is max(value) with CDF 1.0, so a crossing always exists.
    def _break_at(i: Column) -> Column:
        q = i.cast("double") / bins
        k = F.size(F.filter(cdfs, lambda c: c < q))  # 0-based crossing index
        p_hi = F.element_at(F.col("__probes__"), k + 1)
        c_hi = F.element_at(cdfs, k + 1)
        p_lo = F.element_at(F.col("__probes__"), F.greatest(k, F.lit(1)))
        c_lo = F.element_at(cdfs, F.greatest(k, F.lit(1)))
        interp = p_lo + (q - c_lo) / (c_hi - c_lo) * (p_hi - p_lo)
        return F.when((k == 0) | (c_hi <= c_lo), p_hi).otherwise(interp)

    if bins < 2:
        # sequence(1, 0) would count DOWN and fabricate two breaks; one bin
        # means no inner breaks at all (same as the unweighted twin)
        breaks = F.array().cast("array<double>")
    else:
        breaks = F.transform(F.sequence(F.lit(1), F.lit(bins - 1)), _break_at)
    keep = [*group_cols] if group_cols else []
    return agg.select(*keep, breaks.alias("breaks"))


def add_weighted_approx_bin(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    out_col: str = "Decile",
    probes: int | None = None,
    relative_error: float = 0.001,
) -> DataFrame:
    """Weighted twin of :func:`add_approx_bin`: per-group weighted sketch
    breaks broadcast back, rows binned map-side — no sort, no window, and
    the row side never shuffles. This is the 100-TB path for the flagship
    survey-weighted decile (W2); the exact window path remains the
    small-group / oracle semantics."""
    breaks = weighted_approx_quantile_breaks(
        df, value_col, weight_col, bins, group_cols, probes, relative_error
    )
    # left join: a group whose values are ALL NULL has no breaks row
    # (NULLs are dropped before the sketch) — its rows must still come
    # back, with a NULL bin, to keep the operator row-preserving
    joined = _join_groups_broadcast(df, breaks, group_cols, how="left")
    bin_col = F.lit(1) + _count_lt(
        F.col("breaks"), bins - 1, F.col(value_col).cast("double")
    )
    # NULL values get a NULL bin (the exact path drops those rows; a
    # row-preserving operator flags them instead of silently binning to 1)
    bin_col = F.when(
        F.col(value_col).isNotNull() & F.col("breaks").isNotNull(),
        bin_col.cast("int"),
    )
    return joined.withColumn(out_col, bin_col).drop("breaks")


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
    joined = _join_groups_broadcast(df, breaks, group_cols)
    # bin = 1 + number of breaks strictly below the value (unrolled
    # codegen'd binary search, no per-row loop anywhere); NULL values get a
    # NULL bin, matching the weighted twin
    bin_col = F.lit(1) + _count_lt(
        F.col("breaks"), bins - 1, F.col(value_col).cast("double")
    )
    bin_col = F.when(F.col(value_col).isNotNull(), bin_col.cast("int"))
    return joined.withColumn(out_col, bin_col).drop("breaks")
