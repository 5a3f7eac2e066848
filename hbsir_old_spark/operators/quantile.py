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


def _count_lt_sql(arr_sql: str, length: int, v_sql: str) -> Column:
    """:func:`_count_lt` built as ONE SQL string handed to the parser.
    Identical CASE tree and semantics (NULL comparisons fall through the
    ELSE branches to ``length``), but composing the ~2*length-node tree
    through py4j Column calls costs ~0.8 s of driver time per call at
    length=161 (measured round 6), while string-building plus one parse is
    ~4 ms. Use this variant when the operands are plain column names; the
    Column-based twin stays for composed operands and small trees."""

    def first_ge(lo: int, hi: int) -> str:
        if lo > hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"CASE WHEN element_at({arr_sql}, {mid}) >= {v_sql} "
            f"THEN {first_ge(lo, mid - 1)} ELSE {first_ge(mid + 1, hi)} END"
        )

    return F.expr(f"({first_ge(1, length)} - 1)")


def _count_lt_scalar_sql(vals: Sequence[float], v_sql: str) -> Column:
    """Unrolled binary search against LITERAL scalar probes. element_at on
    an array column costs ~3x a scalar comparison per access inside this
    tree (measured round 6: 0.94 s vs 0.49 s per fact pass at 161 probes,
    sf0.1) — when the probe values are known driver-side, compiling them
    into the comparison sites is the fastest formulation. repr() gives
    shortest-round-trip literals, so the compiled constants are
    bit-identical to the collected doubles."""

    def first_ge(lo: int, hi: int) -> str:
        if lo > hi:
            return str(lo)
        mid = (lo + hi) // 2
        return (
            f"CASE WHEN {vals[mid - 1]!r}D >= {v_sql} "
            f"THEN {first_ge(lo, mid - 1)} ELSE {first_ge(mid + 1, hi)} END"
        )

    return F.expr(f"({first_ge(1, len(vals))} - 1)")


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


def _finite_probes(raw) -> list[float] | None:
    """The collected ungrouped probe array as floats; None when a probe is
    non-finite (literal compilation can't carry inf/nan exactly through
    SQL text — those fall back to the join path, which carries them)."""
    import math

    cand = [float(x) for x in raw]
    if not all(math.isfinite(p) for p in cand):
        return None
    return cand


def _assemble_breaks_python(
    probes: list[float], hist_rows, bins: int
) -> list[float] | None:
    """Driver-side twin of the grouped CDF assembly: same running sum over
    the sparse histogram, same crossing lookup, same interpolation — the
    expressions are written operand-for-operand identically, so Python's
    IEEE doubles produce the same values the Column formulation would.
    Returns None (fall back to the join path) when the histogram is empty
    or carries no weight. Leading all-NULL-weight buckets contribute zero
    cumulative weight (sum-ignores-NULL semantics)."""
    hist = sorted(
        (r["__i__"], r["__hw__"]) for r in hist_rows if r["__i__"] is not None
    )
    if not hist:
        return None
    cum: list[tuple[int, float]] = []
    run = 0.0
    for i, hw in hist:
        if hw is not None:
            run += hw
        cum.append((i, run))
    tw = cum[-1][1]
    if not (tw > 0.0):  # zero, negative-sum, or NaN total weight
        return None
    out: list[float] = []
    for b in range(1, bins):
        q = b / bins
        target = q * tw
        k = sum(1 for _, c in cum if c < target)
        hi_i, hi_c = cum[k]
        j_star = hi_i + 1  # 1-based first probe whose CDF reaches q
        p_hi = probes[j_star - 1]
        c_hi = hi_c / tw
        p_lo = probes[max(j_star - 1, 1) - 1]
        c_lo = cum[max(k, 1) - 1][1] / tw
        if j_star == 1 or c_hi <= c_lo:
            out.append(p_hi)
        else:
            out.append(p_lo + (q - c_lo) / (c_hi - c_lo) * (p_hi - p_lo))
    return out


def weighted_approx_quantile_breaks(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    bins: int = 10,
    group_cols: Sequence[str] = (),
    probes: int | None = None,
    relative_error: float | None = None,
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

    Round-6 revision of the round-5 "driver-side assembly is a dead end"
    note: the dead end was assembling the CDF as a LITERAL EXPRESSION
    TOWER (2-3 s of analysis per call). Collecting the tiny grid +
    histogram and doing the break arithmetic in plain Python (the
    ungrouped fast path below) has none of that cost — measured ~1.6x
    faster end-to-end than the fused Column formulation at sf0.1, because
    py4j tree construction and repeated withColumn analysis dominated the
    Column path, not the extra job boundary.
    """
    # NO blanket repartition here: every per-row expression in the
    # ungrouped fast path is a codegen'd scalar tree (~0.5 us/row), so a
    # few-file local scan finishes faster single-task than it takes to
    # round-robin shuffle it three times (measured round 6: the
    # ensure_min_partitions exchange added ~1.3 s across the three passes
    # at sf0.1 for zero win). The grouped join path below still widens —
    # its element_at-heavy search is ~3x costlier per row. At real scale
    # the scan splits on its own and both choices converge.
    df = df.filter(F.col(value_col).isNotNull())
    # default grid: 16 probes per requested bin, floored at 64; capped only
    # as a guard against absurd bins values (the per-group CDF assembly is
    # a linear running-sum fold on ONE row per group)
    n_probes = probes or max(64, min(bins * 16, 2048))
    probe_qs = [i / n_probes for i in range(1, n_probes)]
    # The probe sketch only PLACES candidates; break precision comes from
    # the exact weighted CDF + interpolation below. Rank error 1/(4*probes)
    # is a quarter of the probe spacing — finer sketches (the old fixed
    # accuracy 1000) cost ~30% more sketch time for no break accuracy
    # (measured round 6; the approx-quality tests bound end-to-end error).
    accuracy = (
        max(4 * n_probes, 640) if relative_error is None
        else int(1 / relative_error)
    )
    sketch = F.expr(
        f"approx_percentile(`{value_col}`, array({', '.join(map(str, probe_qs))}), "
        f"{accuracy})"
    )
    grid_aggs = [
        F.concat(
            F.array(F.min(value_col).cast("double")),
            sketch.cast("array<double>"),
            F.array(F.max(value_col).cast("double")),
        ).alias("__probes__")
    ]
    if group_cols:
        df = ensure_min_partitions(df)
    grid = (
        df.groupBy(*group_cols).agg(*grid_aggs) if group_cols else df.agg(*grid_aggs)
    )
    w = F.col(weight_col).cast("double")
    n_cols = n_probes + 1  # min + (n_probes-1) sketch points + max
    # Weighted CDF via a HISTOGRAM aggregation, not one conditional sum per
    # probe: n_probes+1 sum columns in a single agg blows Spark's generated-
    # method size limits and drops the whole aggregation to interpreted
    # evaluation (measured 10x slower). Instead each row computes its
    # bucket = #probes strictly below the value (one unrolled binary
    # search), a narrow (group, bucket) sum shuffles at most probes+1 rows
    # per group per partition, and the per-group CDF assembles from that
    # tiny histogram on one row per group.
    if not group_cols:
        # Ungrouped fast path: ONE probe row — collect it (the same driver
        # round trip the grouped path pays for its eager checkpoint),
        # compile the probes into the histogram search as scalar literals
        # (~2x faster per fact row than element_at on a broadcast array
        # column; see _count_lt_scalar_sql), collect the tiny histogram
        # (at most probes+2 rows), and assemble the breaks in PYTHON —
        # identical IEEE arithmetic, zero expression towers. Round-6
        # measurement: the Column-expression assembly cost ~0.9 s of py4j
        # tree building + analysis per call, more than both data passes.
        # Non-finite probes or zero total weight fall back to the join
        # path, which carries them exactly. An EMPTY input (no rows after
        # the NULL-value filter) must NOT fall through: the join path's
        # histogram collects to an empty __h__ array and element_at(h, -1)
        # throws under Spark 4's ANSI default — the contract (see
        # add_weighted_approx_bin) is a row-preserving NULL-breaks row.
        probe_rows = grid.collect()
        if not probe_rows or probe_rows[0][0] is None:
            return df.sparkSession.createDataFrame(
                [(None,)], "breaks array<double>"
            )
        literal_probes = _finite_probes(probe_rows[0][0])
        if literal_probes is not None:
            bucket = _count_lt_scalar_sql(
                literal_probes, f"CAST(`{value_col}` AS DOUBLE)"
            )
            hist_rows = (
                df.groupBy(bucket.alias("__i__"))
                .agg(F.sum(w).alias("__hw__"))
                .collect()
            )
            vals = _assemble_breaks_python(literal_probes, hist_rows, bins)
            if vals is not None:
                return df.sparkSession.createDataFrame(
                    [(vals,)], "breaks array<double>"
                )
    # Grouped (or degenerate) path: the grid feeds a broadcast join for
    # the histogram AND the CDF assembly below. Left lazy, each join
    # embeds its own copy of the GK subtree and the dominant full-data
    # sketch pass runs twice — canonicalized-exchange reuse is not
    # guaranteed (measured ReusedExchange=0 on this shape). The grid is
    # one short row per group, so materializing it eagerly is ~free and
    # pins exactly one sketch pass + one histogram pass over the fact.
    # Same executor-loss caveat as the dedup band table (dedup.py:399-401):
    # use a reliable checkpoint dir on real clusters.
    # (df was widened above when group_cols is set; the rare ungrouped
    # fallback stays narrow — its inputs are degenerate by definition)
    grid = grid.localCheckpoint(eager=True)
    joined = _join_groups_broadcast(df, grid, group_cols)
    probes_arr = F.col("__probes__")
    bucket = _count_lt_sql(
        "`__probes__`", n_cols, f"CAST(`{value_col}` AS DOUBLE)"
    )
    # coalesce: a bucket whose rows ALL carry NULL weight contributes
    # zero mass (sum-ignores-NULL), keeping the running sum — and hence
    # every break — non-NULL; matches the Python twin in
    # _assemble_breaks_python and the pre-window map formulation
    hist = joined.groupBy(*group_cols, bucket.alias("__i__")).agg(
        F.coalesce(F.sum(w), F.lit(0.0)).alias("__hw__")
    )
    # Running CDF numerator via a WINDOW over the tiny histogram (at most
    # probes+2 rows per group), then one sorted struct array per group.
    # Round-6 measured lesson: the previous formulation assembled the CDF
    # from a dense bucket->weight map with transform/aggregate-fold towers
    # chained through withColumn — each withColumn re-analyzes the whole
    # plan (Dataset.withColumn resolves against the child schema), and the
    # O(probes^2) concat-fold plus the dense-sequence lambdas pushed
    # DRIVER-side build/analysis to ~2-3 s per call and interpreted
    # evaluation to ~0.5 s, 4-5x the cost of both data passes combined.
    # The relational prefix (window running sum, codegen'd, gap-free by
    # construction since empty buckets simply have no row) plus a sparse
    # crossing lookup per break keeps the expression tree ~20x smaller.
    cum_win = (
        Window.partitionBy(*group_cols)
        .orderBy("__i__")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = hist.withColumn("__cw__", F.sum("__hw__").over(cum_win))
    gm = (
        hist.groupBy(*group_cols) if group_cols else hist.groupBy()
    ).agg(
        F.sort_array(F.collect_list(F.struct("__i__", "__cw__"))).alias("__h__"),
    )
    agg = _join_groups_broadcast(gm, grid, group_cols)
    # total weight = last running sum; CDF at probe j = cw of the last
    # bucket i < j, over total
    tw = F.element_at(F.col("__h__"), -1)["__cw__"]

    # break for q=i/bins: linearly interpolate between the bracketing probes
    # (p_lo, cdf_lo) and (p_hi, cdf_hi) where the weighted CDF crosses q —
    # snapping to the grid alone leaves a half-probe-gap bias; interpolation
    # (uniform-density-within-gap assumption) recovers most of it. The final
    # probe is max(value) with CDF 1.0, so a crossing always exists.
    # Crossing in histogram space: the first probe j* with CDF(j*) >= q is
    # (first histogram bucket with cw >= q*tw) + 1 — bucket 0 is always
    # populated (the per-group min lands there), so the probe walk and the
    # histogram walk cross at the same place.
    def _break_at(i: Column) -> Column:
        q = i.cast("double") / bins
        h = F.col("__h__")
        k = F.size(F.filter(h, lambda e: e["__cw__"] < q * tw))
        hi = F.element_at(h, k + 1)
        j_star = hi["__i__"] + 1  # 1-based first probe whose CDF reaches q
        p_hi = F.element_at(probes_arr, j_star)
        c_hi = hi["__cw__"] / tw
        p_lo = F.element_at(probes_arr, F.greatest(j_star - 1, F.lit(1)))
        # CDF at the probe just below j*: the previous histogram row's cw
        c_lo = F.element_at(h, F.greatest(k, F.lit(1)))["__cw__"] / tw
        interp = p_lo + (q - c_lo) / (c_hi - c_lo) * (p_hi - p_lo)
        return F.when((j_star == 1) | (c_hi <= c_lo), p_hi).otherwise(interp)

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
    relative_error: float | None = None,
) -> DataFrame:
    """Weighted twin of :func:`add_approx_bin`: per-group weighted sketch
    breaks broadcast back, rows binned map-side — no sort, no window, and
    the row side never shuffles. This is the 100-TB path for the flagship
    survey-weighted decile (W2); the exact window path remains the
    small-group / oracle semantics.

    Laziness note: the UNGROUPED path executes Spark jobs eagerly at
    construction time (the probe grid and breaks are collected so the
    histogram search compiles to scalar literals); the grouped path stays
    lazy apart from the grid's eager checkpoint. Callers composing
    pipelines should build this operator last if they rely on deferral.

    Cold-start note (measured round 8, sf0.1 local[32]): the first call
    in a process costs ~6.5 s vs ~2.4 s steady state. The gap is NOT the
    eager collects — it is ~4.5 s of one-time plan codegen/JIT for the
    three aggregate shapes (sketch, histogram, caller's final agg), is
    data-size-independent (the same cold cost appears at 16 probes as at
    160, and on sf0.001 as on sf0.1), and transfers fully across SF: one
    tiny-SF run of the same query warms the sf0.1 path to steady state.
    Deferring the collects would only relabel that tax, so the eager
    contract stands; on a long-lived cluster the tax is paid once."""
    breaks = weighted_approx_quantile_breaks(
        df, value_col, weight_col, bins, group_cols, probes, relative_error
    )
    if not group_cols:
        # one global breaks row by construction: collect it (a local
        # relation when the fast path fired; one pipeline execution
        # otherwise) and bin against scalar literals — the same ~2x
        # per-row win as the histogram search. Non-finite/NULL break
        # values re-enter the generic join path via a literal breaks df,
        # so the pipeline still executes exactly once.
        import math

        bvals = breaks.collect()[0][0]
        breaks = df.sparkSession.createDataFrame(
            [(bvals,)], "breaks array<double>"
        )
        if bvals is not None and all(
            v is not None and math.isfinite(v) for v in bvals
        ):
            bin_col = F.lit(1) + _count_lt_scalar_sql(
                [float(v) for v in bvals], f"CAST(`{value_col}` AS DOUBLE)"
            )
            bin_col = F.when(
                F.col(value_col).isNotNull(), bin_col.cast("int")
            )
            return df.withColumn(out_col, bin_col)
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
