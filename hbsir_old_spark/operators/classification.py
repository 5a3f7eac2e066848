"""Classification (code-range) joins — the reference's flagship operator
(J1, /root/reference/hbsir/core/decoder.py:326-476).

The reference loops every classification item over every distinct observed
code in Python (O(items x codes), decoder.py:382-400). Here the
classification is a tiny *dimension DataFrame* of half-open code intervals,
and membership is a **broadcast range join**: ``fact.Code BETWEEN code_start
AND code_end - 1``. One broadcast, no shuffle of the fact table, and levels
become columns via per-level broadcast joins (cheaper at scale than
join-then-pivot, which would shuffle the fact).

Uniqueness (reference decoder.py:436-444 raises when a (year, code, level)
maps to two labels) is validated on the dimension itself: overlapping
intervals within the same (year, level) — an O(dim log dim) driver-side
check, equivalent to the reference's per-observed-code check but independent
of fact size.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hbsir_old_spark.metadata.ranges import CodeRangeSet
from hbsir_old_spark.metadata.versioning import categorize_items


@dataclass
class ClassificationDim:
    """Driver-side classification dimension: one record per
    (year, level, interval) with attribute payload."""

    rows: list[dict] = field(default_factory=list)  # keys: year, level, code_start, code_end, + aspects
    aspects: tuple[str, ...] = ("item_key",)

    def validate_disjoint(self) -> None:
        by_group: dict[tuple, list[tuple[int, int, str]]] = {}
        for r in self.rows:
            by_group.setdefault((r.get("year"), r["level"]), []).append(
                (r["code_start"], r["code_end"], str({a: r.get(a) for a in self.aspects}))
            )
        for key, intervals in by_group.items():
            intervals.sort()
            for (s1, e1, l1), (s2, e2, l2) in zip(intervals, intervals[1:]):
                if s2 < e1:
                    raise ValueError(
                        f"classification not 1:1 for (year, level)={key}: "
                        f"[{s1},{e1}) {l1} overlaps [{s2},{e2}) {l2}"
                    )

    def aspect_type(self, aspect: str) -> str:
        """Spark type for an aspect's values: the real corpus carries
        non-string aspects (e.g. the Duration classification's integer
        ``duration``, commodities.yaml Duration section) — all-int values
        compile to long, all-numeric to double, anything else to string."""
        values = [r.get(aspect) for r in self.rows if r.get(aspect) is not None]
        if values and all(
            isinstance(v, int) and not isinstance(v, bool) for v in values
        ):
            return "long"
        if values and all(
            isinstance(v, (int, float)) and not isinstance(v, bool)
            for v in values
        ):
            return "double"
        return "string"

    def to_spark(self, spark: SparkSession) -> DataFrame:
        """Lift the interval rows to a (broadcastable) dimension frame.
        Memoized per (SESSION, content): the same corpus dimension is
        rebuilt on every gate call and bench iteration, and the
        createDataFrame lift is ~0.2 s of driver work for the multi-
        thousand-row Duration table. DataFrames are immutable and the
        local relation carries no loader state, so reuse is safe — but
        only within the session that created it (a sibling
        ``newSession()`` can carry different session confs that apply at
        createDataFrame/analysis time), hence the session token, which is
        also non-recyclable (see ``cache.object_token``)."""
        from hbsir_old_spark.sources.cache import (
            object_token,
            stable_fingerprint,
        )

        key = (
            object_token(spark),
            stable_fingerprint({"rows": self.rows, "aspects": list(self.aspects)}),
        )
        cached = _DIM_FRAME_CACHE.get(key)
        if cached is not None:
            return cached
        out = self._to_spark_uncached(spark)
        if len(_DIM_FRAME_CACHE) > 64:
            _DIM_FRAME_CACHE.clear()
        _DIM_FRAME_CACHE[key] = out
        return out

    def _to_spark_uncached(self, spark: SparkSession) -> DataFrame:
        cols = ["year", "level", "code_start", "code_end", *self.aspects]
        types = {a: self.aspect_type(a) for a in self.aspects}

        def coerce(aspect, value):
            if value is None:
                return value
            if types[aspect] == "string":
                return str(value)
            if types[aspect] == "double":
                # a 'double' aspect may mix ints and floats; PySpark's
                # DoubleType verifier accepts float only
                return float(value)
            return value

        data = [
            tuple(
                coerce(c, r.get(c)) if c in types else r.get(c) for c in cols
            )
            for r in self.rows
        ]
        schema = "year int, level int, code_start long, code_end long, " + ", ".join(
            f"`{a}` {types[a]}" for a in self.aspects
        )
        return spark.createDataFrame(data, schema=schema)


def build_classification_dim(
    metadata: dict,
    years: Sequence[int] | None = None,
    aspects: Sequence[str] = ("item_key",),
    code_keyword: str = "code",
) -> ClassificationDim:
    """Resolve classification metadata per year into interval rows.

    ``metadata`` follows the reference layout: ``items: {name: {code: <range
    spec>, level: int, <aspect>: value, categories: {...}}}`` with optional
    year versioning anywhere (SURVEY §1.4). ``years=None`` builds a
    year-agnostic dimension (year column null).
    """
    dim = ClassificationDim(aspects=tuple(aspects))
    for year in years if years is not None else [None]:
        resolved = categorize_items(metadata, year if year is not None else 9999)
        for item in resolved["items"]:
            spec = item.get(code_keyword)
            if spec is None:
                continue
            crs = CodeRangeSet(spec, keywords=(code_keyword,))
            for start, end in crs.intervals():
                dim.rows.append(
                    {
                        "year": year,
                        "level": int(item.get("level", 1)),
                        "code_start": start,
                        "code_end": end,
                        **{a: item.get(a) for a in aspects},
                    }
                )
    return dim


#: dims with at most this many interval rows per level compile to a CASE
#: chain instead of a join — zero join, whole-stage codegen, and the
#: predicate logic can const-fold/push down. Threshold measured, not
#: guessed (round 8): the join path plans as a BroadcastNestedLoopJoin
#: whose range predicate runs INTERPRETED per (row x interval), and the
#: full-span food workload (l15: dims of 972 and 2574 intervals at the
#: loaded levels) executed 2.4x slower through it than through CASE
#: chains of the same dims (7.9 s vs 3.3 s at sf0.1; plan-parse cost of
#: the ~0.5 MB CASE SQL is one-time and memoized via _cached_expr).
#: Past ~4k intervals the chain's parse/codegen cost and generated-code
#: size stop paying for themselves and the broadcast join takes over —
#: that path also stays map-only at 100 TB, just constant-slower.
EXPRESSION_STRATEGY_MAX_ROWS = 4096

#: memoized dimension frames (see ClassificationDim.to_spark)
_DIM_FRAME_CACHE: dict = {}


def _escaped_string_literals() -> bool:
    """Whether the active session parses string literals in legacy
    escaped mode (``spark.sql.parser.escapedStringLiterals=true``, the
    Spark<2.0/Hive convention where backslashes stay literal)."""
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    if sess is None:
        return False
    return (
        sess.conf.get("spark.sql.parser.escapedStringLiterals", "false")
        == "true"
    )


def _sql_literal(value, escaped_mode: bool | None = None) -> str:
    """Render a python value as a Spark SQL literal (CASE-branch payload).
    Rejects types the renderer can't prove round-trip (the old F.lit fold
    accepted more; an explicit error beats silently-invalid SQL).

    ``escaped_mode`` is the session's ``escapedStringLiterals`` state;
    callers that render many literals (the CASE-chain compiler) pass it
    precomputed — the default ``None`` looks it up, but that lookup is a
    py4j conf round-trip, and paying it once PER LITERAL was the dominant
    driver-side cost of the 39-year l15 plan build (~850 round-trips,
    ~1.6 s per build; measured r14)."""
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, str):
        # default parser mode: backslash-escape backslashes, double the
        # quotes (both verified against Spark 4.1.2). Under the LEGACY
        # escapedStringLiterals=true mode NEITHER convention survives the
        # lexer faithfully (quote-doubling is retained literally and \\'
        # is still consumed as an escape pair) — there is no SQL-text
        # rendering for these characters in that mode, so the caller must
        # route such payloads through the parser-free Column fold
        # (_needs_literal_fold / _expression_lookup_fold).
        if escaped_mode is None:
            escaped_mode = _escaped_string_literals()
        if escaped_mode and ("'" in value or "\\" in value):
            raise ValueError(
                f"string literal {value!r} cannot be rendered as SQL text "
                "under spark.sql.parser.escapedStringLiterals=true; use "
                "the Column-fold strategy"
            )
        escaped = value.replace("\\", "\\\\").replace("'", "''")
        return f"'{escaped}'"
    if isinstance(value, int):
        return repr(value)
    if isinstance(value, float):
        if value != value:  # NaN
            return "'NaN'"  # the surrounding CAST(... AS double) parses it
        if value in (float("inf"), float("-inf")):
            return f"'{'-' if value < 0 else ''}Infinity'"
        return repr(value)
    raise TypeError(
        f"unsupported classification aspect literal {value!r} "
        f"({type(value).__name__})"
    )


def _sql_number(value) -> str:
    """Render a numeric bound exactly (no int() truncation of float
    bounds; the old Column fold compared them exactly). Non-numeric
    bounds are a hard error BY CONTRACT: the ported corpus's code ranges
    are integers throughout (metadata/ranges.py parses them as numbers),
    so a string bound here means corrupted metadata, not a lexical-
    comparison dimension — failing beats silently compiling SQL that
    compares numbers to strings under ANSI coercion."""
    if isinstance(value, bool) or not isinstance(value, (int, float)):
        raise TypeError(f"non-numeric interval bound {value!r}")
    return repr(value)


def _expression_lookup(
    rows: list[dict],
    code_col: str,
    year_col: str | None,
    aspect: str,
    aspect_type: str = "string",
) -> Column:
    """Compile interval rows into one CASE-chain Column: intervals within a
    (year, level) slice are disjoint (validated), so order is free.
    ``aspect_type`` keeps the output dtype identical to the join strategy's
    dimension column (typed aspects like Duration's integer payload).

    Emitted as ONE ``F.expr`` SQL text rather than a per-row ``F.when``
    fold: each Column op is a py4j round trip, so a 128-interval chain
    built row-at-a-time cost ~1,000 JVM calls PER ASPECT — measured as the
    dominant driver-side term of the 39-year l15 plan compile. A single
    CASE string is one call; the resulting Catalyst tree is identical.
    Rows are emitted in REVERSED order because the old fold nested
    ``when(cond).otherwise(previous)`` (last row wins) while SQL CASE is
    first-match-wins — this keeps override layers (l6) byte-identical.

    Sessions parsing in the legacy ``escapedStringLiterals=true`` mode
    cannot round-trip quotes/backslashes through SQL text at all (see
    ``_sql_literal``); payloads needing those characters fall back to the
    slower parser-free ``F.when`` fold, which builds the identical
    Catalyst tree through the Column API."""
    if not rows:
        return F.lit(None).cast(aspect_type)
    # one conf round-trip per chain compile, threaded through every
    # _sql_literal call below (see its docstring for the measured cost)
    escaped_mode = _escaped_string_literals()
    if escaped_mode and any(
        isinstance(r.get(aspect), str)
        and ("'" in r[aspect] or "\\" in r[aspect])
        for r in rows
    ):
        return _expression_lookup_fold(rows, code_col, year_col, aspect, aspect_type)
    tree_sql = _tree_lookup_sql(
        rows, code_col, year_col, aspect, aspect_type, escaped_mode
    )
    if tree_sql is not None:
        return _cached_expr(tree_sql)
    branches = []
    for r in reversed(rows):
        conds = [
            f"(`{code_col}` >= {_sql_number(r['code_start'])}"
            f" AND `{code_col}` < {_sql_number(r['code_end'])})"
        ]
        if year_col is not None and r.get("year") is not None:
            conds.append(f"`{year_col}` = {_sql_number(r['year'])}")
        value = r.get(aspect)
        if value is not None and aspect_type == "string":
            value = str(value)
        branches.append(
            f"WHEN {' AND '.join(conds)}"
            f" THEN CAST({_sql_literal(value, escaped_mode)} AS {aspect_type})"
        )
    sql = (
        "CASE "
        + " ".join(branches)
        + f" ELSE CAST(NULL AS {aspect_type}) END"
    )
    return _cached_expr(sql)


#: chains below this row count keep the flat CASE: the dispatch tree's win
#: scales with chain length, and small chains are already one short codegen
#: span (measured break-even well under this)
_TREE_MIN_ROWS = 33
#: leaf width of the interval dispatch tree: below this a flat two-sided
#: CASE beats further splitting (branch dispatch has its own cost)
_TREE_LEAF_ROWS = 6


def _tree_lookup_sql(
    rows: list[dict],
    code_col: str,
    year_col: str | None,
    aspect: str,
    aspect_type: str,
    escaped_mode: bool,
) -> str | None:
    """Compile a LARGE interval chain as a balanced dispatch tree instead of
    a flat first-match CASE (r14, guide §1.2 "the distributed algorithm"):
    one year-equality dispatch (each row's year is checked ONCE, not once
    per interval) over per-year binary trees on ``code`` — O(log n)
    comparisons per row instead of O(n). Measured on the 39-year x 60-
    interval shape at 600k rows: 14.6-29.7 s flat vs 3.5-4.6 s tree,
    values bit-identical.

    Equivalence is only claimed where it is PROVABLE from structure, and
    ``None`` (fall back to the flat chain) is returned otherwise:

    * every row carries a year, or none does (mixed chains interleave
      priority between year-specific and year-free rows — the flat chain's
      last-row-wins order matters there);
    * within each year group, intervals sorted by ``code_start`` are
      DISJOINT (``end <= next start``) — then any (code, year) matches at
      most one row, so first-match-wins equals unique-match and re-sorting
      is free. Overlapping rows (override layers compiled with
      ``validate=False``) keep the flat chain's order semantics.

    Leaves keep the exact two-sided conditions and literal rendering of
    the flat chain (``_sql_number`` / ``_sql_literal``), so gaps between
    intervals and NULL codes/years fall through to the same
    ``CAST(NULL AS type)``."""
    if len(rows) < _TREE_MIN_ROWS:
        return None
    groups: dict[object, list[dict]] = {}
    if year_col is None:
        groups[None] = list(rows)
    else:
        for r in rows:
            groups.setdefault(r.get("year"), []).append(r)
        if None in groups and len(groups) > 1:
            return None
    for key, g in groups.items():
        g.sort(key=lambda r: (r["code_start"], r["code_end"]))
        for a, b in zip(g, g[1:]):
            if b["code_start"] < a["code_end"]:
                return None

    def leaf_branch(r: dict) -> str:
        value = r.get(aspect)
        if value is not None and aspect_type == "string":
            value = str(value)
        return (
            f"WHEN (`{code_col}` >= {_sql_number(r['code_start'])}"
            f" AND `{code_col}` < {_sql_number(r['code_end'])})"
            f" THEN CAST({_sql_literal(value, escaped_mode)} AS {aspect_type})"
        )

    null_else = f"ELSE CAST(NULL AS {aspect_type}) END"

    def code_tree(g: list[dict]) -> str:
        if len(g) <= _TREE_LEAF_ROWS:
            return "CASE " + " ".join(leaf_branch(r) for r in g) + " " + null_else
        mid = len(g) // 2
        split = _sql_number(g[mid]["code_start"])
        return (
            f"CASE WHEN `{code_col}` < {split} THEN {code_tree(g[:mid])}"
            f" ELSE {code_tree(g[mid:])} END"
        )

    if year_col is None or set(groups) == {None}:
        return code_tree(groups[None if None in groups else next(iter(groups))])
    year_branches = [
        f"WHEN `{year_col}` = {_sql_number(y)} THEN {code_tree(groups[y])}"
        for y in sorted(groups)
    ]
    return "CASE " + " ".join(year_branches) + " " + null_else


def _expression_lookup_fold(
    rows: list[dict],
    code_col: str,
    year_col: str | None,
    aspect: str,
    aspect_type: str = "string",
) -> Column:
    """Parser-free twin of :func:`_expression_lookup` for payloads SQL
    text cannot carry (legacy escapedStringLiterals mode with quotes or
    backslashes). ~7 py4j calls per interval.

    Built as ONE flat ``when().when()...otherwise(NULL)`` chain over the
    REVERSED rows — a single CaseWhen node with first-match-wins over
    reversed rows, which equals the original last-row-wins fold and the
    SQL path's branch order exactly. The pre-round-8 form nested
    ``when(cond, v).otherwise(previous)`` one level PER interval; with
    the 4096-row expression cutoff that nesting depth would put
    recursive Catalyst tree transforms in StackOverflow territory, where
    the flat chain stays depth-1 at any width."""
    out: Column | None = None
    for r in reversed(rows):
        cond = (F.col(code_col) >= F.lit(r["code_start"])) & (
            F.col(code_col) < F.lit(r["code_end"])
        )
        if year_col is not None and r.get("year") is not None:
            cond = cond & (F.col(year_col) == F.lit(r["year"]))
        value = r.get(aspect)
        if value is not None and aspect_type == "string":
            value = str(value)
        payload = F.lit(value).cast(aspect_type)
        out = F.when(cond, payload) if out is None else out.when(cond, payload)
    if out is None:
        return F.lit(None).cast(aspect_type)
    return out.otherwise(F.lit(None).cast(aspect_type))


#: memoized F.expr by (context, sql text): a CASE chain's JVM-side parse
#: repeats byte-identically on every rebuild of the same dimension (bench
#: iterations, multiple gates over one corpus). Columns are immutable;
#: the key carries the active SparkContext's identity (same contract as
#: the scrub memo). Bounded by BYTES, not entries: with the 4096-interval
#: expression cutoff a single chain's SQL runs to ~0.5 MB, so an entry
#: cap alone could retain hundreds of MB of key text on the driver.
_EXPR_CACHE: dict = {}
_EXPR_CACHE_BYTES = 0
_EXPR_CACHE_MAX_BYTES = 64 << 20
_EXPR_CACHE_LOCK = threading.Lock()


def _cached_expr(sql: str) -> Column:
    global _EXPR_CACHE_BYTES
    from hbsir_old_spark.sources.cache import active_context_token

    key = (active_context_token(), sql)
    col = _EXPR_CACHE.get(key)
    if col is None:
        col = F.expr(sql)
        # UTF-8 bytes, not characters: non-ASCII aspect labels store at
        # 2-4 bytes/char in CPython, which would let a char count blow
        # the advertised cap severalfold. The lock keeps the clear +
        # counter sequence atomic under concurrent driver-side plan
        # builds (an unsynchronized clear could orphan counter bytes and
        # cause premature cache wipes forever after). Re-check under the
        # lock: two threads missing on the same key would otherwise both
        # count the SQL size while only one entry is retained, drifting
        # the counter up until it forces spurious full-cache wipes.
        size = len(sql.encode("utf-8"))
        with _EXPR_CACHE_LOCK:
            raced = _EXPR_CACHE.get(key)
            if raced is not None:
                return raced
            if _EXPR_CACHE_BYTES + size > _EXPR_CACHE_MAX_BYTES:
                _EXPR_CACHE.clear()
                _EXPR_CACHE_BYTES = 0
            _EXPR_CACHE[key] = col
            _EXPR_CACHE_BYTES += size
    return col


def add_classification(
    df: DataFrame,
    dim: ClassificationDim | DataFrame,
    code_col: str = "Code",
    year_col: str | None = "Year",
    levels: Sequence[int] = (1,),
    aspects: Sequence[str] = ("item_key",),
    column_names: dict[str, str] | None = None,
    missing_value_replacements: dict[str, str] | None = None,
    validate: bool = True,
    strategy: str = "auto",
) -> DataFrame:
    """Attach classification labels to ``df`` — one output column per
    (aspect, level), named ``{aspect}_{level}`` (or per ``column_names``,
    keyed like the default name). Reference semantics decoder.py:457-476.

    ``strategy``: ``"expression"`` compiles small dims to CASE chains (no
    join at all); ``"join"`` broadcast-range-joins the dimension (the path
    for hundreds+ of intervals); ``"auto"`` picks by dim size per level.
    """
    column_names = column_names or {}
    missing_value_replacements = missing_value_replacements or {}

    def out_name(aspect: str, level: int) -> str:
        default = f"{aspect}_{level}" if len(levels) > 1 or len(aspects) > 1 else aspect
        return column_names.get(default, default)

    out = df
    if isinstance(dim, ClassificationDim):
        if validate:
            dim.validate_disjoint()
        aspects = tuple(aspects or dim.aspects)
        year_aware = year_col is not None and year_col in df.columns
        rows_by_level: dict[int, list[dict]] = {}
        for r in dim.rows:
            rows_by_level.setdefault(r["level"], []).append(r)
        # one pass over the dim per aspect, not per (level, aspect)
        aspect_types = {a: dim.aspect_type(a) for a in aspects}
        remaining_levels = []
        for level in levels:
            rows = rows_by_level.get(level, [])
            if strategy == "join" or (
                strategy == "auto" and len(rows) > EXPRESSION_STRATEGY_MAX_ROWS
            ):
                remaining_levels.append(level)
                continue
            for aspect in aspects:
                out = out.withColumn(
                    out_name(aspect, level),
                    _expression_lookup(
                        rows,
                        code_col,
                        year_col if year_aware else None,
                        aspect,
                        aspect_types[aspect],
                    ),
                )
        if remaining_levels:
            out = _join_classification(
                out, dim.to_spark(df.sparkSession), code_col, year_col,
                remaining_levels, aspects, out_name,
            )
    else:
        aspects = tuple(aspects)
        out = _join_classification(
            out, dim, code_col, year_col, list(levels), aspects, out_name
        )

    for name, default in missing_value_replacements.items():
        if name in out.columns:
            out = out.withColumn(name, F.coalesce(F.col(name), F.lit(default)))
    return out


def _join_classification(
    df: DataFrame,
    dim_df: DataFrame,
    code_col: str,
    year_col: str | None,
    levels: Sequence[int],
    aspects: Sequence[str],
    out_name,
) -> DataFrame:
    """Broadcast range-join path (per level, so the fact never shuffles)."""
    year_aware = year_col is not None and "year" in dim_df.columns and year_col in df.columns
    out = df
    for level in levels:
        level_dim = dim_df.filter(F.col("level") == level)
        sel = [F.col("code_start"), F.col("code_end")]
        if year_aware:
            sel.append(F.col("year").alias("__cls_year__"))
        for aspect in aspects:
            sel.append(F.col(aspect).alias(out_name(aspect, level)))
        level_dim = level_dim.select(*sel)

        cond = (F.col(code_col) >= F.col("code_start")) & (F.col(code_col) < F.col("code_end"))
        if year_aware:
            # a null dim year means "applies to every year" (year-agnostic
            # rows must behave like the expression strategy, which skips the
            # year predicate for them)
            cond = cond & (
                F.col("__cls_year__").isNull() | (F.col(year_col) == F.col("__cls_year__"))
            )
        out = out.join(F.broadcast(level_dim), cond, "left").drop(
            "code_start", "code_end", "__cls_year__"
        )
    return out
