"""Column-metadata compiler: raw CSV columns -> cleaned, typed columns.

Capability parity with the reference cleaner
(/root/reference/hbsir/core/data_cleaner.py:108-261): per (table, column,
year) metadata declares rename (``new_name``), ``type``
(string/boolean/unsigned/integer/float/category), value ``replace`` maps,
``true_condition`` for booleans, and ``categories`` code->label maps; the
table-level ``missings`` policy (error|drop|keep) governs columns present in
the data but absent from metadata.

Everything compiles to ONE ``select`` of cast/when expressions — a single
projection over the scan, no per-column passes. Categories become string
labels via literal-map lookup (Spark has no categorical dtype; parquet
dictionary encoding recovers the storage win). Numeric downcasting is
dropped deliberately: Long/Double + parquet encoding make it moot on Spark
(SURVEY §4).
"""

from __future__ import annotations

from functools import lru_cache
from itertools import chain
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hbsir_old_spark.metadata.versioning import resolve_versioned


def scrub_string(col: Column | str) -> Column:
    """The reference's raw-string scrub (data_cleaner.py:216-227): strip
    newline/CR/commas/at/plus/star/brackets/underscore/question marks,
    middle-dot -> '.', trailing dots, leading minus noise; blank -> null.

    Called by name (the clean-table path), the built expression is
    memoized: the ~10 py4j round trips per build were a measured term of
    the 39-year plan compile, and the same raw column names recur across
    every era and every construct. Column trees are immutable, so reuse
    across DataFrames/plans is safe — but only within one JVM gateway:
    the cache key includes the active SparkContext's identity, so a
    context restarted after ``spark.stop()`` (long-lived apps, test
    suites) rebuilds instead of handing back Columns whose py4j refs
    point at a dead gateway. The token is non-recyclable (a raw ``id()``
    can be reissued to the replacement context after GC — see
    ``cache.object_token``)."""
    if isinstance(col, str):
        from hbsir_old_spark.sources.cache import active_context_token

        return _scrub_named(active_context_token(), col)
    return _scrub_expr(col)


@lru_cache(maxsize=4096)
def _scrub_named(ctx_key: int, name: str) -> Column:
    return _scrub_expr(F.col(name))


def _scrub_expr(col: Column) -> Column:
    # This runs on EVERY string column of EVERY raw row — at sf0.1 the old
    # four-chained-regexp formulation executed ~17M Java regexes and
    # dominated the whole real-corpus pipeline (~4 s of a 5 s gate,
    # measured round 6). Three of the four rules are plain character
    # rules, so express them as single-pass char ops:
    #   [\n\r,@+*\[\]_?] -> ''  and  '·' -> '.'   == one translate()
    #   trailing \.+$ -> ''                        == rtrim(trimStr=".")
    # Only the lookahead rule (leading minus runs NOT followed by a digit)
    # stays a regex, guarded behind a cheap startswith so the regex engine
    # never runs on the ~100% of values that don't begin with '-'.
    out = F.translate(col, "·\n\r,@+*[]_?", ".")
    out = F.rtrim(out, F.lit("."))
    out = F.when(
        out.startswith("-"), F.regexp_replace(out, r"^-+(?=\D|$)", "")
    ).otherwise(out)
    out = F.trim(out)
    return F.nullif(out, F.lit(""))


def _typed_column(raw: Column, meta: Mapping) -> Column:
    """Compile one column's type metadata into an expression."""
    ctype = meta.get("type", "string")
    replace = meta.get("replace")
    if replace:
        # simultaneous mapping like pandas Series.replace: every condition
        # tests the ORIGINAL value, so {1: 2, 2: 3} maps 1 -> 2 (never 3)
        original = raw
        replaced = None
        for old, new in replace.items():
            cond = original == F.lit(old)
            replaced = (
                F.when(cond, F.lit(new)) if replaced is None
                else replaced.when(cond, F.lit(new))
            )
        raw = replaced.otherwise(original)
    if ctype == "string":
        return raw
    if ctype == "boolean":
        true_condition = meta.get("true_condition", 1)
        return raw.cast("int") == F.lit(true_condition)
    if ctype in ("unsigned", "integer"):
        return raw.cast("long")
    if ctype == "float":
        return raw.cast("double")
    if ctype == "category":
        categories = meta.get("categories") or {}
        code = raw.cast("int")
        if not categories:
            return code.cast("string")
        literal_map = F.create_map(
            *chain.from_iterable(
                (F.lit(int(k)), F.lit(str(v))) for k, v in categories.items()
            )
        )
        return literal_map[code]
    raise ValueError(f"unknown column type {ctype!r}")


#: engine-provenance columns the S1 raw loader adds; they are not survey
#: columns, so table metadata doesn't declare them — always passed through
#: (unless the metadata explicitly mentions them, which then wins)
PROVENANCE_COLUMNS = ("Urban_Rural",)


def clean_table(
    df: DataFrame,
    table_meta: Mapping,
    year: int,
    scrub: bool = True,
    passthrough: tuple = (),
) -> DataFrame:
    """Apply year-resolved column metadata to a raw table.

    ``table_meta`` mirrors the reference layout: ``{"columns": {raw_name:
    {new_name, type, ...} | "drop"}, "missings": "error"|"drop"|"keep"}``
    with year versioning anywhere. Unknown-column policy is enforced
    EAGERLY (the reference raises at load time, data_cleaner.py:148-151;
    schema inspection needs no job, so laziness is preserved).

    ``passthrough`` names engine-internal columns (e.g. the era-batched
    year tag) copied through untouched, exempt from the missings policy.
    """
    return clean_table_resolved(
        df, resolve_versioned(table_meta, year) or {}, scrub, passthrough
    )


#: memoized cleaning select-lists: the whole expression list for one
#: (resolved metadata, input schema) pair. A repeated table build (bench
#: iterations, multiple gates over the same corpus) re-derives byte-
#: identical Column trees through ~100 py4j round trips per era — the
#: dominant driver-side term of a warm full-span compile (measured round
#: 8: clean_table_resolved was 1.1 s of a ~3 s construct). Columns are
#: immutable, so reuse across DataFrames is safe; the key carries the
#: active SparkContext's identity (same contract as _scrub_named).
_CLEAN_EXPRS_CACHE: dict = {}


def clean_table_resolved(
    df: DataFrame,
    resolved: Mapping,
    scrub: bool = True,
    passthrough: tuple = (),
) -> DataFrame:
    """:func:`clean_table` over metadata already resolved for one year (or
    one era of identical years — the era-batched registry resolves once
    and cleans the whole multi-year union with a single select)."""
    from hbsir_old_spark.sources.cache import (
        active_context_token,
        stable_fingerprint,
    )

    string_cols = frozenset(
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    )
    key = (
        active_context_token(),
        stable_fingerprint(resolved),
        tuple(df.columns),
        string_cols,
        scrub,
        tuple(passthrough),
    )
    exprs = _CLEAN_EXPRS_CACHE.get(key)
    if exprs is None:
        exprs = _clean_exprs(
            tuple(df.columns), string_cols, resolved, scrub, tuple(passthrough)
        )
        if len(_CLEAN_EXPRS_CACHE) > 512:
            _CLEAN_EXPRS_CACHE.clear()
        _CLEAN_EXPRS_CACHE[key] = exprs
    return df.select(*exprs)


def _clean_exprs(
    columns: tuple,
    string_cols: frozenset,
    resolved: Mapping,
    scrub: bool,
    passthrough: tuple,
) -> list[Column]:
    columns_meta: dict = resolved.get("columns") or {}
    missings = resolved.get("missings", "error")

    meta_by_lower = {str(k).lower(): (k, v) for k, v in columns_meta.items()}
    exprs: list[Column] = []
    for name in columns:
        key = name.lower()
        if key not in meta_by_lower:
            if name in PROVENANCE_COLUMNS or name in passthrough:
                exprs.append(F.col(name))
                continue
            if missings == "error":
                raise KeyError(
                    f"column {name!r} not declared in metadata (missings=error)"
                )
            if missings == "drop":
                continue
            exprs.append(F.col(name))
            continue
        _, meta = meta_by_lower[key]
        if meta is None or meta == "drop":
            continue
        if scrub and name in string_cols:
            raw: Column = scrub_string(name)  # by name -> memoized expression
        else:
            raw = F.col(name)
        new_name = (meta.get("new_name") if isinstance(meta, Mapping) else None) or name
        exprs.append(_typed_column(raw, meta if isinstance(meta, Mapping) else {}).alias(new_name))
    return exprs


def load_raw_csv(
    spark,
    urban_path: str | None,
    rural_path: str | None,
) -> DataFrame:
    """S1: read per-(table, year) urban+rural CSVs as all-string columns,
    tag provenance, and union by name (missing columns -> null)."""
    parts = []
    for path, flag in ((urban_path, "Urban"), (rural_path, "Rural")):
        if path is None:
            continue
        df = spark.read.option("header", True).csv(path)
        parts.append(df.withColumn("Urban_Rural", F.lit(flag)))
    if not parts:
        raise ValueError("at least one of urban/rural path is required")
    out = parts[0]
    for df in parts[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out
