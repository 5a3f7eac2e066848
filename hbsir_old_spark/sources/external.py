"""External-dataset registry: dotted-name addressing with goto/alias/from
indirection (reference parity:
/root/reference/hbsir/external_data/external_data_cleaner.py:80-175 and
metadata/external_data.yaml).

Resolution semantics:
* navigate the metadata dict part by part; a ``goto`` entry redirects to a
  new dotted address with the REMAINING parts appended;
* an ``alias`` entry names the sibling sub-key to use when the address
  stops at this node;
* leaf types: ``manual`` (table provided out-of-band), ``url`` (fetch raw
  file then apply the named cleaning function), ``from`` (load the listed
  datasets recursively, then combine via the cleaning function).

External tables are small (CPI series, Gini, county maps) — cleaned on the
driver in pandas and lifted to Spark with ``createDataFrame``, then
broadcast into fact joins. The fetcher is injectable; the default raises
(no network in this environment), and cleaned results are parquet-cached.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

Cleaner = Callable[[Any], pd.DataFrame]
Fetcher = Callable[[str, str], None]


def nan_to_null(df: DataFrame) -> DataFrame:
    """Normalize floating NaN to SQL NULL on every float/double column.

    ``createDataFrame(pandas)`` lifts pandas ``NaN`` as Spark DOUBLE ``NaN``
    (``isNull`` false, counted by ``count()``), but the reference's pandas
    semantics treat NaN as *missing* throughout (e.g. the monthly-CPI dash
    cell, reference external_data/cleaning_scripts.py:25-29, must survive a
    left-join deflation as a missing price, not poison it under ANSI). The
    lift boundary is the one place the two models meet, so the conversion
    happens here — including the parquet-cache read-back, which round-trips
    the NaN."""
    selected = []
    changed = False
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            selected.append(
                F.nanvl(df[f.name], F.lit(None).cast(f.dataType)).alias(f.name)
            )
            changed = True
        else:
            selected.append(df[f.name])
    return df.select(*selected) if changed else df


def _default_fetcher(url: str, dest: str) -> None:
    """urllib fetch (http(s)/file schemes) — ``file://`` URLs make the whole
    url-type path testable offline; deployments needing auth/retry inject
    their own fetcher."""
    from hbsir_old_spark.sources.acquire import download

    download(url, dest, overwrite=True)


class ExternalDataRegistry:
    def __init__(
        self,
        spark: SparkSession,
        metadata: Mapping[str, Any],
        cleaners: Mapping[str, Cleaner] | None = None,
        manual_tables: Mapping[str, pd.DataFrame] | None = None,
        fetcher: Fetcher | None = None,
        cache_dir: str | None = None,
    ):
        self.spark = spark
        self.metadata = dict(metadata)
        self.cleaners = dict(cleaners or {})
        self.manual_tables = dict(manual_tables or {})
        self.fetcher = fetcher or _default_fetcher
        self.cache_dir = cache_dir
        if cache_dir:
            os.makedirs(cache_dir, exist_ok=True)

    # -- address resolution ----------------------------------------------
    def _navigate(self, name: str) -> tuple[str, Any]:
        parts = name.split(".")
        meta: Any = self.metadata
        walked: list[str] = []
        while parts:
            part = parts.pop(0)
            if not isinstance(meta, Mapping) or part not in meta:
                raise KeyError(f"external dataset {'.'.join(walked + [part])!r} not found")
            meta = meta[part]
            walked.append(part)
            if isinstance(meta, Mapping) and "goto" in meta:
                target = meta["goto"].split(".") + parts
                return self._navigate(".".join(target))
        if isinstance(meta, Mapping) and "alias" in meta:
            alias = meta["alias"]
            # a dotted alias is an ABSOLUTE address, a bare one is relative
            # to the current node (reference external_data_cleaner.py:57-60)
            if "." in alias:
                return self._navigate(alias)
            return self._navigate(".".join(walked + [alias]))
        return ".".join(walked), meta

    def _cleaner(self, name: str) -> Cleaner:
        key = name.replace(".", "_")
        if key not in self.cleaners:
            raise KeyError(f"no cleaning function registered for {name!r} (key {key!r})")
        return self.cleaners[key]

    # -- loading ---------------------------------------------------------
    def load_pandas(self, name: str) -> pd.DataFrame:
        resolved, meta = self._navigate(name)
        cache_path = (
            os.path.join(self.cache_dir, f"{resolved}.parquet") if self.cache_dir else None
        )
        if cache_path and os.path.exists(cache_path):
            return pd.read_parquet(cache_path)

        if meta == "manual" or (isinstance(meta, Mapping) and "manual" in meta):
            table = self.manual_tables[resolved]
        elif isinstance(meta, Mapping) and "from" in meta:
            sources = meta["from"]
            sources = sources if isinstance(sources, list) else [sources]
            loaded = [self.load_pandas(s) for s in sources]
            # single-source 'from' entries hand the cleaner the bare frame
            # (reference semantics: the cleaning fn signature depends on the
            # declared source arity)
            table = self._cleaner(resolved)(loaded if len(loaded) > 1 else loaded[0])
        elif isinstance(meta, Mapping) and "url" in meta:
            raw_path = os.path.join(self.cache_dir or ".", "_raw", resolved)
            os.makedirs(os.path.dirname(raw_path), exist_ok=True)
            self.fetcher(meta["url"], raw_path)
            table = self._cleaner(resolved)(raw_path)
        else:
            raise ValueError(f"external dataset {resolved!r} has no recognized type")

        if cache_path:
            os.makedirs(os.path.dirname(cache_path), exist_ok=True)
            table.to_parquet(cache_path, index=False)
        return table

    def load(self, name: str) -> DataFrame:
        return nan_to_null(self.spark.createDataFrame(self.load_pandas(name)))

    def load_named(
        self,
        table_name: str,
        data_source: str | None = None,
        frequency: str | None = None,
        separate_by: str | None = None,
    ) -> DataFrame:
        """Reference-style named lookup (external_data/__init__.py:39-41):
        the dotted address is ``data_source.table_name.frequency.
        separate_by`` lowercased, None parts dropped — e.g.
        ``("CPI_1400", "SCI", "Annual", "Urban_Rural")`` resolves
        ``sci.cpi_1400.annual.urban_rural``."""
        parts = [data_source, table_name, frequency, separate_by]
        name = ".".join(p for p in parts if p is not None).lower()
        return self.load(name)
