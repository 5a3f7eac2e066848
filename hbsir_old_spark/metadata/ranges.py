"""Integer range-set algebra for commodity/occupation code ranges and year
availability.

Capability parity with the reference's range parser
(/root/reference/hbsir/utils/argham.py:14-241): YAML values that are ints,
``{start, end, step}`` dicts, lists, or nested dicts all parse into a set of
integer ranges supporting ``in`` membership, union, and equality.

Spark integration beyond the reference: :meth:`CodeRangeSet.intervals` yields
merged half-open ``[start, end)`` intervals — the rows of a broadcastable
classification *dimension* DataFrame — and
:meth:`CodeRangeSet.contains_column` compiles membership straight to a JVM
boolean Column (no UDF), so code-range predicates push into the scan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable, Iterator, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class RangeParseOptions:
    """Knobs for parsing loosely-structured YAML range declarations."""

    keywords: tuple[str, ...] = ()
    default_start: int | None = None
    default_end: int | None = None
    default_step: int = 1
    bounds: tuple[int, int] | None = None  # ints outside are silently ignored


@dataclass
class _Span:
    start: int
    stop: int  # exclusive
    step: int = 1

    def __contains__(self, value: int) -> bool:
        if not self.start <= value < self.stop:
            return False
        return (value - self.start) % self.step == 0


class CodeRangeSet:
    """A set of integers defined by single values and (possibly stepped)
    half-open ranges, with `in` membership and union.

    >>> crs = CodeRangeSet([1, 2, {"start": 6, "end": 10}])
    >>> 2 in crs, 5 in crs, 6 in crs, 10 in crs
    (True, False, True, False)
    """

    def __init__(self, spec=None, options: RangeParseOptions | None = None, **kwargs):
        self.options = options or RangeParseOptions(**kwargs)
        self._spans: list[_Span] = []
        self.min: int | None = None
        self.max: int | None = None
        self._parse(spec)

    # -- parsing ---------------------------------------------------------
    def _parse(self, spec) -> None:
        if spec is None:
            return
        if isinstance(spec, bool):  # bool is an int subclass; never a code
            return
        if isinstance(spec, int):
            self._add_int(spec)
        elif isinstance(spec, (list, tuple)):
            for item in spec:
                self._parse(item)
        elif isinstance(spec, dict):
            self._parse_dict(spec)
        # other scalar types are ignored, matching the reference's leniency

    def _parse_dict(self, spec: dict) -> None:
        for word in self.options.keywords:
            if word in spec:
                self._parse(spec[word])
                return
        if "start" in spec or "end" in spec:
            start = spec.get("start", self.options.default_start)
            end = spec.get("end", self.options.default_end)
            step = spec.get("step", self.options.default_step)
            if start is None or end is None:
                raise ValueError(f"range needs both start and end: {spec!r}")
            self._add_span(_Span(start, end, step))
        else:
            for value in spec.values():
                self._parse(value)

    def _add_int(self, value: int) -> None:
        bounds = self.options.bounds
        if bounds is not None and not bounds[0] <= value <= bounds[1]:
            return
        self._add_span(_Span(value, value + 1))

    def _add_span(self, span: _Span) -> None:
        if span.stop <= span.start:
            return
        self._spans.append(span)
        self.min = span.start if self.min is None else min(self.min, span.start)
        hi = span.stop - 1
        if span.step > 1:
            hi = span.start + ((span.stop - 1 - span.start) // span.step) * span.step
        self.max = hi if self.max is None else max(self.max, hi)

    # -- set protocol ----------------------------------------------------
    def __contains__(self, value: int) -> bool:
        if self.min is None or not self.min <= value <= self.max:  # type: ignore[operator]
            return False
        return any(value in span for span in self._spans)

    def contains_all(self, values: Iterable[int]) -> list[bool]:
        return [v in self for v in values]

    def __bool__(self) -> bool:
        return bool(self._spans)

    def __or__(self, other: "CodeRangeSet") -> "CodeRangeSet":
        result = CodeRangeSet(options=self.options)
        for span in (*self._spans, *other._spans):
            result._add_span(_Span(span.start, span.stop, span.step))
        return result

    __add__ = __or__

    def __eq__(self, other: object) -> bool:
        if isinstance(other, CodeRangeSet):
            return self.intervals() == other.intervals()
        if isinstance(other, range):
            return self.intervals() == [(other.start, other.stop)] and other.step == 1
        if isinstance(other, int):
            return self.intervals() == [(other, other + 1)]
        return NotImplemented

    def __hash__(self):
        return hash(tuple(self.intervals()))

    def __repr__(self) -> str:
        parts = [
            str(s) if e == s + 1 else f"[{s}, {e})" for s, e in self.intervals()
        ]
        return f"CodeRangeSet({', '.join(parts)})"

    def __iter__(self) -> Iterator[int]:
        seen: set[int] = set()
        for span in self._spans:
            seen.update(range(span.start, span.stop, span.step))
        return iter(sorted(seen))

    def values(self) -> set[int]:
        return set(self)

    # -- interval / Spark compilation ------------------------------------
    def intervals(self) -> list[tuple[int, int]]:
        """Merged, sorted, disjoint half-open ``[start, end)`` intervals.

        Stepped spans (step > 1) are expanded to singleton intervals — in the
        reference metadata steps are rare and narrow, so this stays tiny and
        the result is always broadcastable as a dimension table.
        """
        atoms: list[tuple[int, int]] = []
        for span in self._spans:
            if span.step == 1:
                atoms.append((span.start, span.stop))
            else:
                atoms.extend(
                    (v, v + 1) for v in range(span.start, span.stop, span.step)
                )
        atoms.sort()
        merged: list[tuple[int, int]] = []
        for start, stop in atoms:
            if merged and start <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], stop))
            else:
                merged.append((start, stop))
        return merged

    def contains_column(self, col: Column | str) -> Column:
        """Compile membership into a native boolean Column (JVM-side, no UDF):
        an OR-chain of ``BETWEEN`` over merged intervals. Catalyst folds and
        pushes this into the parquet scan when used as a filter."""
        col = F.col(col) if isinstance(col, str) else col
        intervals = self.intervals()
        if not intervals:
            return F.lit(False)
        cond = None
        for start, stop in intervals:
            piece = col.between(start, stop - 1) if stop - start > 1 else (col == start)
            cond = piece if cond is None else cond | piece
        return cond


def parse_years(spec, available: Sequence[int] | None = None,
                first_year: int = 1363, last_year: int = 1401) -> list[int]:
    """Normalize a year selector into a sorted int list.

    Accepts: int, 2-digit int (<=60 → +1400, <100 → +1300), list, "all",
    "last", range strings like "86-90" and comma lists "86-90,99" — the same
    surface as the reference parser
    (/root/reference/hbsir/utils/parsing_utils.py:13-101).
    """
    pool = sorted(available) if available else list(range(first_year, last_year + 1))

    def pivot(y: int) -> int:
        if y <= 60:
            return y + 1400
        if y < 100:
            return y + 1300
        return y

    if spec is None or (isinstance(spec, str) and spec.lower() == "all"):
        return pool
    if isinstance(spec, str) and spec.lower() == "last":
        return [pool[-1]]
    if isinstance(spec, bool):
        raise TypeError("year selector cannot be a bool")
    if isinstance(spec, int):
        return [pivot(spec)]
    if isinstance(spec, str):
        years: list[int] = []
        for chunk in spec.replace(" ", "").split(","):
            if "-" in chunk:
                lo, hi = (pivot(int(p)) for p in chunk.split("-"))
                years.extend(range(lo, hi + 1))
            elif chunk:
                years.append(pivot(int(chunk)))
        return sorted(set(years))
    if isinstance(spec, range):
        return [pivot(y) for y in spec]
    if isinstance(spec, (list, tuple)):
        out: set[int] = set()
        for item in spec:
            out.update(parse_years(item, available, first_year, last_year))
        return sorted(out)
    raise TypeError(f"unsupported year selector: {spec!r}")
