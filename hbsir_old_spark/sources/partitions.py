"""Driver-side year inference from Hive-partition paths.

The reference's pandas engine always knows its year list up front (every
loader takes explicit years: ``/root/reference/hbsir/data_engine.py`` —
``TableHandler.__init__(name, years, ...)``); this engine additionally
accepts ``years=None`` on the decode/enrich entry points and infers the
span from the fact itself.  The naive inference —
``df.select("Year").distinct().collect()`` — is an eager full scan of the
fact: harmless at test SF, a multi-minute job on an unpartitioned 100 TB
table, and pure waste when the fact sits in the engine's own
Year-partitioned layout (``sources/writer.py:write_partitioned``) where
the year list is already spelled out in the directory names.

``infer_years`` therefore tries a metadata-only path first: list the
plan's input files (a driver-side catalog/file-index walk, no executor
job) and parse the ``Year=<n>`` partition-directory segment.  That yields
the *partition superset* of the years actually present after any
in-plan filters — deliberately acceptable for every internal caller,
because all of them use the list only to build year-keyed side inputs
(weights, classification dims, equivalence scales, ranking populations)
that are joined back on ``Year`` (plus ``ID``) or window-partitioned by
``Year``: a side-year with no matching fact rows is inert in the result,
and availability pruning (``TableRegistry.available_years``) drops
superset years the metadata cannot serve.  When any input file lacks a
parseable ``Year=`` segment (non-partitioned layout, mixed sources,
``__HIVE_DEFAULT_PARTITION__``), the helper falls back to the exact
distinct scan.
"""
from __future__ import annotations

import re
from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["years_from_input_files", "infer_years"]


def years_from_input_files(df: DataFrame, year_col: str = "Year") -> list[int] | None:
    """Metadata-only year listing: parse ``<year_col>=<int>`` partition
    segments out of the plan's input files.

    Returns the sorted distinct years if EVERY input file carries a
    parseable segment, else ``None`` (caller should fall back to a scan).
    Note the result is the file-layout superset of the years present in
    ``df`` — in-plan filters are not reflected.  ``df.inputFiles()`` walks
    the analyzed plan's file indexes on the driver; no Spark job runs.
    """
    try:
        files = df.inputFiles()
    except Exception:  # non-file-backed plans (e.g. createDataFrame)
        return None
    if not files:
        return None
    pat = re.compile(r"(?:^|/)" + re.escape(year_col) + r"=([^/]+)/")
    years: set[int] = set()
    for f in files:
        m = pat.search(f)
        if m is None:
            return None
        try:
            years.add(int(m.group(1)))
        except ValueError:  # __HIVE_DEFAULT_PARTITION__ or non-integer
            return None
    return sorted(years)


def infer_years(df: DataFrame, year_col: str = "Year") -> list[int]:
    """Year list for ``years=None`` callers: partition-path listing when
    the layout spells it out, exact distinct scan otherwise.

    CONTRACT — superset, not exact: the path listing reflects the file
    LAYOUT, so on a filtered frame it may return years the frame no
    longer contains. That is deliberate (it avoids a full distinct scan
    at 100 TB) and is safe only for callers that use the list to build
    year-keyed SIDE INPUTS joined back on ``year_col`` — extra years
    simply never match. Call-site checklist (every caller must be
    join-back-shaped; a new caller whose year list drives OUTPUT ROWS
    must run the exact ``df.select(year_col).distinct()`` scan instead):

    * ``plans/registry.py  add_classification`` — the year list feeds
      ``build_classification_dim``; extra dim years never match the
      fact's ``(year_col, Code)`` rows
    * ``api.py  add_weight``                 — weights frame, joined back
    * ``api.py  adjust_by_equivalence_scale``— scale frame, joined back
    * ``api.py  add_quantile (by-variable)`` — derived frame, joined back
    """
    years = years_from_input_files(df, year_col)
    if years is not None:
        return years
    return sorted(r[0] for r in df.select(year_col).distinct().collect())
