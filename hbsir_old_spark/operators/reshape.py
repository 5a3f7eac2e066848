"""Reshape operators: melt (wide->long), pivot (long->wide), and
union-with-missing-columns (reference parity: P18/P19/U1; SURVEY §2.2, §2.8).

* melt uses the SQL ``stack()`` table-generating expression — one narrow
  projection, no shuffle, no UDF.
* pivot uses ``groupBy().pivot(values=...).agg()``; pass explicit pivot
  values whenever known so Spark skips the extra distinct-collection job.
* union_tables reproduces pandas concat alignment: columns are unioned by
  name, missing columns become nulls, and the output keeps first-seen column
  order (SURVEY §7.3 U1 — dtype widening is delegated to Spark's
  unionByName type coercion).
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    drop_nulls: bool = False,
) -> DataFrame:
    """Wide -> long via ``stack``: one output row per (row, value column).
    Numeric value columns of mixed width are upcast to double (pandas melt
    widens the same way); ``stack`` itself requires homogeneous types."""
    numeric = {"byte", "short", "integer", "long", "float", "double", "decimal", "null"}
    types = {df.schema[c].dataType.typeName() for c in value_cols}
    if len(types) > 1 and types <= numeric:
        df = df.select(
            *[c for c in df.columns if c not in value_cols],
            *[F.col(c).cast("double").alias(c) for c in value_cols],
        )
    pairs = ", ".join(f"'{c}', `{c}`" for c in value_cols)
    stack_expr = f"stack({len(value_cols)}, {pairs}) as (`{var_name}`, `{value_name}`)"
    out = df.select(*[F.col(c) for c in id_cols], F.expr(stack_expr))
    if drop_nulls:
        out = out.filter(F.col(value_name).isNotNull())
    return out


def pivot_table(
    df: DataFrame,
    group_cols: Sequence[str],
    pivot_col: str,
    value_col: str,
    agg: str = "sum",
    pivot_values: Sequence | None = None,
) -> DataFrame:
    """Long -> wide: ``groupBy(group).pivot(pivot_col).agg(agg(value))``."""
    grouped = df.groupBy(*group_cols)
    pivoted = grouped.pivot(pivot_col, list(pivot_values)) if pivot_values else grouped.pivot(pivot_col)
    return pivoted.agg(getattr(F, agg)(value_col))


def union_tables(dfs: Iterable[DataFrame]) -> DataFrame:
    """Vertical concat of heterogeneous tables: union by name, missing
    columns null-filled, first-seen column order preserved (U1)."""
    dfs = [df for df in dfs if df is not None]
    if not dfs:
        raise ValueError("union_tables needs at least one DataFrame")
    order: list[str] = []
    for df in dfs:
        for c in df.columns:
            if c not in order:
                order.append(c)
    # BALANCED fold, not left-deep: every unionByName call re-analyzes its
    # whole accumulated subtree, so a left fold over n branches costs
    # O(n^2) driver-side analysis — measured as the dominant share of a
    # 90 s plan-compile for the 39-year full-span food build (round 7).
    # The balanced tree does the same unions in O(n log n) analysis work
    # and produces an identical row set (union is associative).
    while len(dfs) > 1:
        dfs = [
            dfs[i].unionByName(dfs[i + 1], allowMissingColumns=True)
            if i + 1 < len(dfs)
            else dfs[i]
            for i in range(0, len(dfs), 2)
        ]
    return dfs[0].select(*order)
