"""Named standard-table transforms (the X1 external-function registry).

Reference parity: /root/reference/hbsir/schema_functions/standard_tables.py
(number of members A2, equivalence scales P12, season P11) — re-expressed as
single Spark aggregations / column expressions. These are the only
"external functions" the reference schema calls; the registry pattern
replaces arbitrary ``module.fn`` imports with an explicit allowlist.
"""

from __future__ import annotations

from itertools import chain
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SEASONS = {1: "Spring", 2: "Summer", 3: "Autumn", 4: "Winter"}


def number_of_members(df: DataFrame) -> DataFrame:
    """A2: household size — Members=count, Adults=count(Age>=14),
    Childs=Members-Adults; one groupBy aggregation."""
    out = df.groupBy("Year", "ID").agg(
        F.count("Member_Number").alias("Members"),
        F.sum(F.when(F.col("Age") >= 14, 1).otherwise(0)).alias("Adults"),
    )
    return out.withColumn("Childs", F.col("Members") - F.col("Adults"))


def equivalence_scale(df: DataFrame) -> DataFrame:
    """P12: household equivalence scales over Number_of_Members output —
    reference-exact fields (standard_tables.py:16-26): Household ≡ 1 ("no
    adjustment"), Per_Capita = Members, OECD / OECD_Modified / Square_Root."""
    return df.select(
        "Year",
        "ID",
        F.lit(1.0).alias("Household"),
        F.col("Members").cast("double").alias("Per_Capita"),
        (0.7 * F.col("Adults") + 0.3 + 0.5 * F.col("Childs")).alias("OECD"),
        (0.5 * F.col("Adults") + 0.5 + 0.3 * F.col("Childs")).alias("OECD_Modified"),
        F.sqrt(F.col("Members")).alias("Square_Root"),
    )


def add_season(df: DataFrame) -> DataFrame:
    """P11: Month -> Season label, reference-exact formula ``Month // 3 + 1``
    (standard_tables.py:29-38). Note the inherited quirk: month 12 maps to
    code 5, which has no season label and therefore yields null — replicated
    deliberately for parity (unlike the bugs listed in SURVEY §5, this is
    observable reference behavior, not an implementation accident)."""
    quarter = (F.floor(F.col("Month") / 3) + 1).cast("int")
    season_map = F.create_map(
        *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in SEASONS.items())
    )
    return df.withColumn("Season", season_map[quarter])


def bin_by_breaks(
    value: Column | str,
    breaks: Sequence[float],
    labels: Sequence[str],
    right: bool = True,
) -> Column:
    """P24: labeled interval binning — the Spark twin of ``pandas.cut``
    as the reference's income-bracket results example uses it
    (/root/reference/examples/ISC/results/urban/1400/results.ipynb cell 3:
    ``pd.cut(df["Income"], [-inf, 12e7, ..., inf], labels=[...])``).

    ``breaks`` must be strictly increasing with ``len(labels) ==
    len(breaks) - 1``. Interval ``i`` is ``(breaks[i], breaks[i+1]]``
    when ``right=True`` (the pandas default), ``[breaks[i],
    breaks[i+1])`` otherwise. ``±inf`` endpoints express unbounded outer
    brackets and need no special-casing — the literal double comparisons
    reproduce pandas exactly (``-inf`` itself falls outside an open
    ``(-inf, b]`` left edge, ``+inf`` inside a closed ``(a, +inf]``
    right edge). NULL input and out-of-range values bin to NULL (the
    pandas NaN), which grouped consumers drop via ``observed=True``
    semantics.

    Scale shape: a pure when-chain column expression — map-only, no
    join, no shuffle, fully inside whole-stage codegen; brackets are
    presentation-layer small (tens), so chain length is never a concern
    the way classification dims are (classification.py's 4096 cutoff).
    """
    if len(breaks) < 2:
        # match pandas.cut's explicit rejection of < 2 bin edges (an empty
        # when-chain would otherwise crash opaquely below)
        raise ValueError(f"need at least 2 breaks to form an interval, got {len(breaks)}")
    if len(labels) != len(breaks) - 1:
        raise ValueError(
            f"need exactly len(breaks)-1 labels: got {len(labels)} labels "
            f"for {len(breaks)} breaks"
        )
    lows, highs = list(breaks[:-1]), list(breaks[1:])
    for lo, hi in zip(lows, highs):
        if not lo < hi:
            raise ValueError(f"breaks must be strictly increasing, got {lo} >= {hi}")
    col = F.col(value) if isinstance(value, str) else value
    out = None
    for lo, hi, label in zip(lows, highs, labels):
        if right:
            cond = (col > F.lit(float(lo))) & (col <= F.lit(float(hi)))
        else:
            cond = (col >= F.lit(float(lo))) & (col < F.lit(float(hi)))
        out = F.when(cond, F.lit(label)) if out is None else out.when(cond, F.lit(label))
    return out.otherwise(F.lit(None).cast("string"))


DEFAULT_EXTERNAL_FUNCTIONS = {
    "number_of_members": number_of_members,
    "equivalence_scale": equivalence_scale,
    "add_season": add_season,
}
