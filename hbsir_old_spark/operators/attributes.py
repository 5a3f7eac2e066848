"""Household-ID attribute decoding (reference parity: P16/P17/J2/F2,
/root/reference/hbsir/core/decoder.py:520-651; positions
/root/reference/hbsir/metadata/household.yaml:2-38).

The reference loops per year in Python and joins a per-year map. Here the
whole decode is ONE vectorized column expression: integer arithmetic pulls
the digit slice out of the ID, and a year-dependent ``when`` chain handles
ID-length drift across years. Code -> name lookup is a literal ``map`` (tiny
dicts) or a broadcast-joined dimension for larger maps. No UDF, no join for
the arithmetic path — the filter (`select`) can push down to the scan.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from itertools import chain


def extract_id_digits(id_col: Column | str, id_length: int, start: int, end: int) -> Column:
    """Digits ``[start, end)`` (0-indexed from the left) of an integer id of
    known decimal width: ``id % 10^(L-start) // 10^(L-end)`` — pure integer
    arithmetic, codegen'd (reference decoder.py:572-586)."""
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    remainder = col % F.lit(10 ** (id_length - start))
    return F.floor(remainder / F.lit(10 ** (id_length - end))).cast("long")


def map_codes(
    code_col: Column | str,
    mapping: Mapping[int, str],
    default: str | None = None,
) -> Column:
    """Literal map lookup (code -> label), null/default for absent keys
    (reference decoder.py:588-624). Stays JVM-side via ``create_map``."""
    col = F.col(code_col) if isinstance(code_col, str) else code_col
    literal_map = F.create_map(
        *chain.from_iterable((F.lit(int(k)), F.lit(v)) for k, v in mapping.items())
    )
    looked_up = literal_map[col.cast("int")]
    if default is not None:
        looked_up = F.coalesce(looked_up, F.lit(default))
    return looked_up


def attribute_column(
    id_col: str,
    year_col: str,
    positions_by_year: Mapping[int, tuple],
    mapping: Mapping[int, str] | None = None,
    default: str | None = None,
) -> Column:
    """Year-versioned attribute decode: ``positions_by_year`` maps a starting
    year to ``(id_length, start, end)`` or ``(id_length, start, end,
    mapping)``; the applicable entry is the greatest key <= Year (simple
    versioning). Produces a single when-chain Column.

    The optional 4th element carries a per-boundary code->name mapping for
    attributes whose labels change over time (the reference's Urban_Rural
    codes flip meaning at 1387, household.yaml:16-21); it overrides the
    function-level ``mapping``. A boundary whose ``start`` is None decodes
    to null over its span — the reference's "attribute not in the ID these
    years" (County, household.yaml:183-188).
    """
    years = sorted(positions_by_year)
    # if ANY boundary maps codes to labels, the whole column is a string
    # column and unmapped boundaries stringify their raw code — mixing
    # string and bigint branches in one when-chain would make Spark force
    # the chain to BIGINT and crash casting a label at runtime (reachable
    # via a local-override mapping that starts later than the first
    # ID_Length year; matches pandas object-dtype semantics)
    any_mapped = mapping is not None or any(
        len(positions_by_year[b]) > 3 and positions_by_year[b][3]
        for b in years
    )
    expr: Column | None = None
    # ascending fold => the HIGHEST applicable boundary wraps outermost and
    # is checked first (simple-versioning: greatest key <= Year wins)
    for boundary in years:
        entry = positions_by_year[boundary]
        id_length, start, end = entry[:3]
        m = entry[3] if len(entry) > 3 else mapping
        if start is None or end is None:
            piece = F.lit(None).cast("string" if any_mapped else "long")
        else:
            code = extract_id_digits(id_col, id_length, start, end)
            if m:
                piece = map_codes(code, m, default)
            elif any_mapped:
                piece = code.cast("string")
            else:
                piece = code
        cond = F.col(year_col) >= boundary
        expr = piece if expr is None else F.when(cond, piece).otherwise(expr)
    if expr is None:
        raise ValueError("positions_by_year is empty")
    # years below the earliest boundary decode to null
    return F.when(F.col(year_col) >= years[0], expr)


def add_attribute(
    df: DataFrame,
    name: str,
    positions_by_year: Mapping[int, tuple[int, int, int]],
    mapping: Mapping[int, str] | None = None,
    id_col: str = "ID",
    year_col: str = "Year",
    default: str | None = None,
) -> DataFrame:
    """J2: attach a decoded attribute column (Urban_Rural / Province / ...)."""
    return df.withColumn(
        name, attribute_column(id_col, year_col, positions_by_year, mapping, default)
    )


def select_by_attribute(
    df: DataFrame,
    name: str,
    values: Sequence,
    positions_by_year: Mapping[int, tuple[int, int, int]],
    mapping: Mapping[int, str] | None = None,
    id_col: str = "ID",
    year_col: str = "Year",
) -> DataFrame:
    """F2: filter rows whose decoded attribute is in ``values`` without
    keeping the helper column. The predicate is pure ID/Year arithmetic, so
    Catalyst can push it toward the scan. (The reference's broken
    list-in-list province filter, api.py:430, is deliberately fixed here.)
    """
    col = attribute_column(id_col, year_col, positions_by_year, mapping)
    return df.filter(col.isin(list(values)))
