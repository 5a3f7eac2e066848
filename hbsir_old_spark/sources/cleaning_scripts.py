"""SCI external-data cleaning scripts — independently-written ports of the
reference's raw-sheet cleaners (reference parity:
/root/reference/hbsir/external_data/cleaning_scripts.py:10-116, dispatched
by name from external_data_cleaner.py:165-172).

The raw inputs are headerless spreadsheet grids (the Statistical Centre's
CPI / Gini downloads): positional integer row/column labels, mixed junk
headers, dash-or-blank missing cells. Each ``sci_*`` function takes such a
grid (or, for the ``from``-combiners, already-cleaned frames) and returns a
TIDY pandas frame — the reference returns index-carrying frames
(Year[, Month][, Urban_Rural] MultiIndex), which has no Spark analogue, so
this port surfaces the index levels as ordinary columns. Values and
coverage windows are otherwise identical.

These run on the DRIVER: external series are a few hundred rows (42 years x
12 months at most), cleaned once, parquet-cached by the registry, and
broadcast into fact joins — distributing the cleaning would be pure
overhead.

:func:`reference_cleaners` adapts the family to the
``ExternalDataRegistry`` calling convention (url-type cleaners receive the
raw FILE PATH; from-type receive the cleaned frame, or list of frames when
the metadata declares several sources).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

__all__ = ["load_raw_grid", "reference_cleaners", "year_month_frame"]


def load_raw_grid(path: str) -> pd.DataFrame:
    """Load a raw download as a HEADERLESS grid: integer row index 0..n-1,
    integer column labels 0..m-1 — the coordinate system every ``sci_*``
    slice below is written against (mirroring the reference's
    ``pd.read_excel(path, header=None)``, external_data_cleaner.py:140-141).
    xlsx is detected by the zip magic (raw cache paths carry no extension);
    anything else parses as CSV, which is what the offline test fixtures
    use."""
    with open(path, "rb") as fh:
        magic = fh.read(4)
    if magic[:2] == b"PK":
        try:
            grid = pd.read_excel(path, header=None)
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise ImportError(
                f"reading the xlsx download {path!r} needs an Excel engine "
                "(pip install openpyxl); offline tests use CSV fixtures "
                "with the same headerless grid layout"
            ) from exc
    else:
        grid = pd.read_csv(path, header=None, skip_blank_lines=False)
    grid.columns = range(grid.shape[1])
    return grid


def year_month_frame(from_year: int, to_year: int) -> pd.DataFrame:
    """Tidy twin of the reference's ``create_year_month_index``
    (cleaning_scripts.py:5-8): the (Year, Month) product as columns,
    month-fastest — the row order of every monthly CPI sheet."""
    years = range(from_year, to_year + 1)
    return pd.DataFrame(
        [(y, m) for y in years for m in range(1, 13)], columns=["Year", "Month"]
    )


def _series(vals: pd.Series, out_col: str) -> pd.Series:
    """Numeric-coerce a sliced value run; blank / dash cells become NaN
    (spreadsheet missing-value convention)."""
    cleaned = vals.astype("string").str.strip().replace({"-": None, "": None})
    return pd.to_numeric(cleaned, errors="raise").rename(out_col)


def _attach(index_frame: pd.DataFrame, vals: pd.Series, out_col: str) -> pd.DataFrame:
    if len(vals) != len(index_frame):
        raise ValueError(
            f"raw sheet carries {len(vals)} values; expected {len(index_frame)}"
        )
    out = index_frame.copy()
    out[out_col] = _series(vals, out_col).to_numpy()
    return out


# -- 1395-base CPI family (cleaning_scripts.py:10-59) -----------------------


def sci_cpi_1395_urban_singleindex_monthly(grid: pd.DataFrame) -> pd.DataFrame:
    """Urban single-index sheet: CPI runs down column 2 from row 2, one row
    per month, 1361-1401 (cleaning_scripts.py:10-15)."""
    return _attach(year_month_frame(1361, 1401), grid.loc[2:, 2], "CPI")


def sci_cpi_1395_urban_singleindex_annual(grid: pd.DataFrame) -> pd.DataFrame:
    """Annual urban sheet: (Year, CPI) pairs in columns 0-1 from row 2
    (cleaning_scripts.py:18-22)."""
    out = grid.loc[2:, [0, 1]].reset_index(drop=True)
    out.columns = ["Year", "CPI"]
    out["Year"] = pd.to_numeric(out["Year"]).astype("int64")
    out["CPI"] = _series(out["CPI"], "CPI").to_numpy()
    return out


def sci_cpi_1395_rural_maingroups_monthly(grid: pd.DataFrame) -> pd.DataFrame:
    """Rural main-groups sheet: the all-items row is row 3, monthly values
    from column 53 rightward, 1374-1401 (cleaning_scripts.py:25-29)."""
    return _attach(year_month_frame(1374, 1401), grid.loc[3, 53:], "CPI")


def sci_cpi_1395_rural_maingroups_annual(grid: pd.DataFrame) -> pd.DataFrame:
    """Annual rural main-groups: row 4, columns 1.., years 1361-1400
    (cleaning_scripts.py:32-36)."""
    idx = pd.DataFrame({"Year": range(1361, 1401)})
    return _attach(idx, grid.loc[4, 1:], "CPI")


def sci_cpi_1395_monthly(grid: pd.DataFrame) -> pd.DataFrame:
    """Nationwide monthly: row 3, columns 1.., 1390-1401
    (cleaning_scripts.py:39-43)."""
    return _attach(year_month_frame(1390, 1401), grid.loc[3, 1:], "CPI")


def sci_cpi_1395_annual(grid: pd.DataFrame) -> pd.DataFrame:
    """Nationwide annual: row 4, columns 1.., 1390-1400
    (cleaning_scripts.py:46-50)."""
    idx = pd.DataFrame({"Year": range(1390, 1401)})
    return _attach(idx, grid.loc[4, 1:], "CPI")


def _concat_urban_rural(tables: list[pd.DataFrame]) -> pd.DataFrame:
    """Tidy twin of the reference's keyed concat (cleaning_scripts.py:53-60):
    the [Urban, Rural] source order becomes an Urban_Rural column."""
    urban, rural = tables
    out = pd.concat(
        [urban.assign(Urban_Rural="Urban"), rural.assign(Urban_Rural="Rural")],
        ignore_index=True,
    )
    lead = ["Urban_Rural"] + [c for c in out.columns if c != "Urban_Rural"]
    return out[lead]


def sci_cpi_1395_monthly_urban_rural(tables: list[pd.DataFrame]) -> pd.DataFrame:
    return _concat_urban_rural(tables)


def sci_cpi_1395_annual_urban_rural(tables: list[pd.DataFrame]) -> pd.DataFrame:
    return _concat_urban_rural(tables)


# -- 1400-base CPI family (cleaning_scripts.py:63-110) ----------------------


def sci_cpi_1400_urban_singleindex_monthly(grid: pd.DataFrame) -> pd.DataFrame:
    """1400-base urban single-index sheet: same layout as the 1395 sheet,
    coverage extended to 1402 (cleaning_scripts.py:63-66)."""
    return _attach(year_month_frame(1361, 1402), grid.loc[2:, 2], "CPI")


def sci_cpi_1400_urban_singleindex_annual(monthly: pd.DataFrame) -> pd.DataFrame:
    """Annual = per-year mean of the monthly series
    (cleaning_scripts.py:69-73). The registry hands the single declared
    source as a bare frame."""
    return monthly.groupby("Year", as_index=False)[["CPI"]].mean()


def sci_cpi_1400_rural_maingroups_monthly(grid: pd.DataFrame) -> pd.DataFrame:
    """1400-base rural main-groups sheet (cleaning_scripts.py:76-89): a
    TRANSPOSED layout — row 1 holds year labels only at each year's first
    month (forward-filled), row 2 the month/season label, rows 3+ one main
    group each with the group name in column 0. Output: one row per
    (Year, Month_Seasion) observation, one column per main group, dashes /
    blanks as NaN."""
    years = pd.to_numeric(
        grid.loc[1, 1:].infer_objects(copy=False).ffill()
    ).astype("int64")
    months = grid.loc[2, 1:].astype("string").str.strip()
    out = pd.DataFrame(
        {"Year": years.to_numpy(), "Month_Seasion": months.to_numpy()}
    )
    for row in grid.index[grid.index >= 3]:
        group = str(grid.loc[row, 0]).strip()
        vals = grid.loc[row, 1:].astype("string")
        # any cell containing whitespace or a dash is a missing marker —
        # whole-cell NaN, the reference's replace(r"[\s\-]", None) semantics
        cleaned = vals.mask(vals.str.contains(r"[\s\-]", regex=True, na=False))
        out[group] = pd.to_numeric(cleaned, errors="raise").to_numpy()
    return out


def sci_cpi_1400_rural_maingroups_annual(monthly: pd.DataFrame) -> pd.DataFrame:
    """Annual = per-year mean of every numeric main-group column
    (cleaning_scripts.py:92-96); NaN months drop out of the mean
    (spreadsheet missing-cell convention)."""
    return monthly.groupby("Year", as_index=False).mean(numeric_only=True)


def sci_cpi_1400_annual_urban_rural(tables: list[pd.DataFrame]) -> pd.DataFrame:
    """Combine the annual urban single index with the FIRST rural main
    group (the all-items index, leftmost in the sheet) under an
    Urban_Rural column (cleaning_scripts.py:99-110)."""
    urban, rural = tables
    first_group = [c for c in rural.columns if c != "Year"][0]
    rural_cpi = rural[["Year", first_group]].rename(columns={first_group: "CPI"})
    return _concat_urban_rural([urban[["Year", "CPI"]], rural_cpi])


# -- Gini (cleaning_scripts.py:113-116) -------------------------------------


def sci_gini_annual(grid: pd.DataFrame) -> pd.DataFrame:
    """Gini sheet: row 2, columns 1.., years 1363-1401."""
    idx = pd.DataFrame({"Year": range(1363, 1402)})
    return _attach(idx, grid.loc[2, 1:], "Gini")


# -- registry adapter -------------------------------------------------------

#: url-type leaves: cleaner receives the raw grid loaded from the fetched
#: file. from-type leaves: cleaner receives already-cleaned frame(s).
_URL_CLEANERS: dict[str, Callable[[pd.DataFrame], pd.DataFrame]] = {
    "sci_cpi_1395_urban_singleindex_monthly": sci_cpi_1395_urban_singleindex_monthly,
    "sci_cpi_1395_urban_singleindex_annual": sci_cpi_1395_urban_singleindex_annual,
    "sci_cpi_1395_rural_maingroups_monthly": sci_cpi_1395_rural_maingroups_monthly,
    "sci_cpi_1395_rural_maingroups_annual": sci_cpi_1395_rural_maingroups_annual,
    "sci_cpi_1395_monthly": sci_cpi_1395_monthly,
    "sci_cpi_1395_annual": sci_cpi_1395_annual,
    "sci_cpi_1400_urban_singleindex_monthly": sci_cpi_1400_urban_singleindex_monthly,
    "sci_cpi_1400_rural_maingroups_monthly": sci_cpi_1400_rural_maingroups_monthly,
    "sci_gini_annual": sci_gini_annual,
}

_FROM_CLEANERS: dict[str, Callable] = {
    "sci_cpi_1395_monthly_urban_rural": sci_cpi_1395_monthly_urban_rural,
    "sci_cpi_1395_annual_urban_rural": sci_cpi_1395_annual_urban_rural,
    "sci_cpi_1400_urban_singleindex_annual": sci_cpi_1400_urban_singleindex_annual,
    "sci_cpi_1400_rural_maingroups_annual": sci_cpi_1400_rural_maingroups_annual,
    "sci_cpi_1400_annual_urban_rural": sci_cpi_1400_annual_urban_rural,
}


def reference_cleaners() -> dict[str, Callable]:
    """The full dispatch table for ``ExternalDataRegistry(cleaners=...)``,
    keyed the way the registry derives keys from dotted dataset names
    (``name.replace('.', '_')`` — external.py:84-88, mirroring the
    reference's module-attribute dispatch at external_data_cleaner.py:172)."""
    out: dict[str, Callable] = {}
    for key, fn in _URL_CLEANERS.items():
        out[key] = (lambda path, _fn=fn: _fn(load_raw_grid(path)))
    out.update(_FROM_CLEANERS)
    return out
