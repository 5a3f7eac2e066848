"""Unit tests for the SCI external-data cleaning scripts and the full
registry chain through the REAL ported external_data.yaml (reference
parity: external_data/cleaning_scripts.py + external_data_cleaner.py).

Fixture grids replicate the positional layout of the real downloads
(headerless sheets, junk title rows, year/month label rows, dash missing
cells) with deterministic synthetic values.
"""

from __future__ import annotations

import math
import os

import pandas as pd
import pytest

from hbsir_old_spark.sources import cleaning_scripts as cs


def _pad(rows: list[list]) -> pd.DataFrame:
    width = max(len(r) for r in rows)
    grid = pd.DataFrame([r + [None] * (width - len(r)) for r in rows])
    grid.columns = range(width)
    return grid


def cpi_u(y: int, m: int) -> float:
    return float((y - 1360) * 12 + m)


def cpi_r(y: int, m: int, g: int) -> float:
    return float((y - 1373) * 10 + m + 0.25 * g)


def urban_monthly_grid(to_year: int) -> pd.DataFrame:
    rows = [["title junk"], [None, "header", "CPI"]]
    for y in range(1361, to_year + 1):
        for m in range(1, 13):
            rows.append([y, m, cpi_u(y, m)])
    return _pad(rows)


def rural_1400_monthly_grid() -> pd.DataFrame:
    """Transposed sheet: row 1 = year at each year's first month only,
    row 2 = month labels, rows 3+ = one main group each. (1390, month 1)
    is a dash — a missing cell — in every group."""
    years = range(1390, 1403)
    year_row: list = ["junk"]
    month_row: list = ["junk"]
    groups = ["Total", "Food", "Housing"]
    data_rows: list[list] = [[g] for g in groups]
    for y in years:
        for m in range(1, 13):
            year_row.append(y if m == 1 else None)
            month_row.append(f"M{m}")
            for gi, row in enumerate(data_rows):
                row.append("-" if (y == 1390 and m == 1) else cpi_r(y, m, gi))
    return _pad([["title junk"], year_row, month_row] + data_rows)


class TestUrlCleaners:
    def test_urban_singleindex_monthly_1395(self):
        out = cs.sci_cpi_1395_urban_singleindex_monthly(urban_monthly_grid(1401))
        assert list(out.columns) == ["Year", "Month", "CPI"]
        assert len(out) == (1401 - 1361 + 1) * 12
        row = out[(out.Year == 1400) & (out.Month == 7)].iloc[0]
        assert row["CPI"] == cpi_u(1400, 7)

    def test_urban_singleindex_annual_1395(self):
        rows = [["junk"], ["junk"]] + [
            [y, float(100 + y - 1361)] for y in range(1361, 1401)
        ]
        out = cs.sci_cpi_1395_urban_singleindex_annual(_pad(rows))
        assert list(out.columns) == ["Year", "CPI"]
        assert out[out.Year == 1399].iloc[0]["CPI"] == 138.0

    def test_rural_maingroups_monthly_1395(self):
        n = (1401 - 1374 + 1) * 12
        rows = [[], [], [], ["junk"] * 53 + [float(i) for i in range(n)]]
        out = cs.sci_cpi_1395_rural_maingroups_monthly(_pad(rows))
        assert len(out) == n
        assert out.iloc[0]["Year"] == 1374 and out.iloc[0]["CPI"] == 0.0

    def test_rural_maingroups_annual_1395(self):
        rows = [[], [], [], [], ["junk"] + [float(i) for i in range(40)]]
        out = cs.sci_cpi_1395_rural_maingroups_annual(_pad(rows))
        assert list(out.Year) == list(range(1361, 1401))
        assert out.iloc[-1]["CPI"] == 39.0

    def test_cpi_1395_monthly_and_annual(self):
        monthly = _pad([[], [], [], ["j"] + [float(i) for i in range(144)]])
        annual = _pad([[], [], [], [], ["j"] + [float(i) for i in range(11)]])
        m = cs.sci_cpi_1395_monthly(monthly)
        a = cs.sci_cpi_1395_annual(annual)
        assert len(m) == 144 and m.iloc[0]["Year"] == 1390
        assert list(a.Year) == list(range(1390, 1401))

    def test_gini_annual(self):
        rows = [[], [], ["j"] + [round(0.3 + i / 1000, 3) for i in range(39)]]
        out = cs.sci_gini_annual(_pad(rows))
        assert list(out.columns) == ["Year", "Gini"]
        assert list(out.Year) == list(range(1363, 1402))
        assert out.iloc[0]["Gini"] == 0.3

    def test_row_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="expected"):
            cs.sci_cpi_1395_monthly(_pad([[], [], [], ["j", 1.0, 2.0]]))


class TestRural1400:
    def test_monthly_transposition_and_missing(self):
        out = cs.sci_cpi_1400_rural_maingroups_monthly(rural_1400_monthly_grid())
        assert list(out.columns) == ["Year", "Month_Seasion", "Total", "Food", "Housing"]
        assert len(out) == 13 * 12
        first = out.iloc[0]
        assert first["Year"] == 1390 and first["Month_Seasion"] == "M1"
        assert math.isnan(first["Total"])  # the dash cell
        row = out[(out.Year == 1395) & (out.Month_Seasion == "M3")].iloc[0]
        assert row["Food"] == cpi_r(1395, 3, 1)

    def test_annual_mean_skips_missing(self):
        out = cs.sci_cpi_1400_rural_maingroups_annual(
            cs.sci_cpi_1400_rural_maingroups_monthly(rural_1400_monthly_grid())
        )
        # 1390 misses month 1: mean of months 2..12 -> base + 7
        assert out[out.Year == 1390].iloc[0]["Total"] == pytest.approx(
            (1390 - 1373) * 10 + 7.0
        )
        # complete years: mean month term 6.5
        assert out[out.Year == 1400].iloc[0]["Housing"] == pytest.approx(
            (1400 - 1373) * 10 + 6.5 + 0.5
        )

    def test_annual_urban_rural_takes_first_group(self):
        urban = pd.DataFrame({"Year": [1400, 1401], "CPI": [100.0, 140.0]})
        rural = pd.DataFrame(
            {"Year": [1400, 1401], "Total": [90.0, 130.0], "Food": [1.0, 2.0]}
        )
        out = cs.sci_cpi_1400_annual_urban_rural([urban, rural])
        assert list(out.columns) == ["Urban_Rural", "Year", "CPI"]
        assert out[(out.Urban_Rural == "Rural") & (out.Year == 1401)].iloc[0][
            "CPI"
        ] == 130.0


class TestFullChain:
    """Drive the REAL ported external_data.yaml end-to-end: an injected
    fetcher serves CSV fixture grids for the SCI urls; load_named builds
    the reference's dotted address; the from/alias/goto indirection and the
    cleaner dispatch all run for real."""

    @pytest.fixture()
    def registry(self, spark, tmp_path):
        from hbsir_old_spark.metadata.corpus import load_corpus
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        meta = load_corpus().external_data
        # parse the GATE's fixture CSVs (one source of truth for the grid
        # data): if the l13 formulas ever drift from this module's
        # cpi_u/cpi_r expectations, the value assertions below catch it
        import io

        import __spark_entry__ as entry_mod

        grids = {
            name: pd.read_csv(
                io.StringIO(csv), header=None, skip_blank_lines=False
            )
            for name, csv in entry_mod._l13_fixture_csvs().items()
        }
        url_to_grid = {}
        reg_probe = ExternalDataRegistry(spark, meta)
        for name, grid in grids.items():
            _, node = reg_probe._navigate(name)
            url_to_grid[node["url"]] = grid

        def fetcher(url: str, dest: str) -> None:
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            url_to_grid[url].to_csv(dest, index=False, header=False)

        return ExternalDataRegistry(
            spark,
            meta,
            cleaners=cs.reference_cleaners(),
            fetcher=fetcher,
            cache_dir=str(tmp_path / "ext"),
        )

    def test_cpi_1400_annual_urban_rural(self, registry):
        df = registry.load_named("CPI_1400", "SCI", "Annual", "Urban_Rural")
        rows = {(r["Urban_Rural"], r["Year"]): r["CPI"] for r in df.collect()}
        # urban annual = mean of the 12 monthly values
        assert rows[("Urban", 1400)] == pytest.approx((1400 - 1360) * 12 + 6.5)
        # rural 1390 misses month 1 in the fixture
        assert rows[("Rural", 1390)] == pytest.approx((1390 - 1373) * 10 + 7.0)
        assert rows[("Rural", 1402)] == pytest.approx((1402 - 1373) * 10 + 6.5)
        # coverage: urban 1361-1402, rural 1390-1402
        urban_years = [y for (ur, y) in rows if ur == "Urban"]
        assert min(urban_years) == 1361 and max(urban_years) == 1402

    def test_top_level_cpi_alias_resolves_to_1400_annual(self, registry):
        """'cpi' -> goto cpi_1400 -> goto sci.cpi_1400 -> alias annual."""
        resolved, node = registry._navigate("cpi.urban_rural")
        assert resolved == "sci.cpi_1400.annual.urban_rural"
        assert "from" in node

    def test_gini_via_named_lookup(self, spark, tmp_path):
        from hbsir_old_spark.metadata.corpus import load_corpus
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        meta = load_corpus().external_data
        grid = _pad([[], [], ["j"] + [round(0.30 + i / 100, 2) for i in range(39)]])

        def fetcher(url: str, dest: str) -> None:
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            grid.to_csv(dest, index=False, header=False)

        reg = ExternalDataRegistry(
            spark,
            meta,
            cleaners=cs.reference_cleaners(),
            fetcher=fetcher,
            cache_dir=str(tmp_path / "ext"),
        )
        df = reg.load_named("Gini", "SCI", "Annual")
        got = {r["Year"]: r["Gini"] for r in df.collect()}
        assert got[1363] == 0.30 and got[1401] == 0.68


class TestFullChain1395:
    """The 1395-base family end-to-end through the real yaml: the monthly
    urban_rural combiner pulls TWO url leaves with different sheet layouts
    (urban column-2 run vs rural row-3 band from column 53)."""

    def test_cpi_1395_monthly_urban_rural(self, spark, tmp_path):
        from hbsir_old_spark.metadata.corpus import load_corpus
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        meta = load_corpus().external_data
        urban = urban_monthly_grid(1401)
        n = (1401 - 1374 + 1) * 12
        rural = _pad(
            [[], [], [],
             ["junk"] * 53 + [cpi_r(1374 + i // 12, i % 12 + 1, 0) for i in range(n)]]
        )
        probe = ExternalDataRegistry(spark, meta)
        url_to_grid = {
            probe._navigate("sci.cpi_1395_urban_singleindex.monthly")[1]["url"]: urban,
            probe._navigate("sci.cpi_1395_rural_maingroups.monthly")[1]["url"]: rural,
        }

        def fetcher(url: str, dest: str) -> None:
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            url_to_grid[url].to_csv(dest, index=False, header=False)

        reg = ExternalDataRegistry(
            spark,
            meta,
            cleaners=cs.reference_cleaners(),
            fetcher=fetcher,
            cache_dir=str(tmp_path / "ext95"),
        )
        df = reg.load_named("CPI_1395", "SCI", "Monthly", "Urban_Rural")
        rows = {
            (r["Urban_Rural"], r["Year"], r["Month"]): r["CPI"]
            for r in df.collect()
        }
        # coverage: urban 1361-1401, rural 1374-1401, both monthly
        assert len(rows) == (1401 - 1361 + 1) * 12 + n
        assert rows[("Urban", 1400, 7)] == cpi_u(1400, 7)
        assert rows[("Rural", 1374, 1)] == cpi_r(1374, 1, 0)
        assert rows[("Rural", 1401, 12)] == cpi_r(1401, 12, 0)
        assert ("Rural", 1373, 12) not in rows

    def test_dash_cell_lifts_as_sql_null(self, spark, tmp_path):
        """The rural (1374, month 1) dash cell must arrive in Spark as SQL
        NULL, not DOUBLE NaN: ``createDataFrame(pandas)`` lifts NaN as NaN
        (isNull false, counted by count()), which NaN-poisons a left-join
        deflation and crashes ANSI casts — the r7 ``l16`` failure. Asserted
        on BOTH the fresh lift and the parquet-cache read-back, which
        round-trips the NaN."""
        from pyspark.sql import functions as F

        from hbsir_old_spark.metadata.corpus import load_corpus
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        meta = load_corpus().external_data
        urban = urban_monthly_grid(1401)
        n = (1401 - 1374 + 1) * 12
        rural = _pad(
            [[], [], [],
             ["junk"] * 53
             + ["-" if i == 0 else cpi_r(1374 + i // 12, i % 12 + 1, 0)
                for i in range(n)]]
        )
        probe = ExternalDataRegistry(spark, meta)
        url_to_grid = {
            probe._navigate("sci.cpi_1395_urban_singleindex.monthly")[1]["url"]: urban,
            probe._navigate("sci.cpi_1395_rural_maingroups.monthly")[1]["url"]: rural,
        }

        def fetcher(url: str, dest: str) -> None:
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            url_to_grid[url].to_csv(dest, index=False, header=False)

        reg = ExternalDataRegistry(
            spark,
            meta,
            cleaners=cs.reference_cleaners(),
            fetcher=fetcher,
            cache_dir=str(tmp_path / "ext95nan"),
        )
        for attempt in ("fresh", "cache"):  # second load hits the parquet cache
            df = reg.load_named("CPI_1395", "SCI", "Monthly", "Urban_Rural")
            dash = df.filter(
                (F.col("Urban_Rural") == "Rural")
                & (F.col("Year") == 1374)
                & (F.col("Month") == 1)
            )
            assert dash.count() == 1, attempt
            assert dash.filter(F.col("CPI").isNull()).count() == 1, attempt
            assert dash.filter(F.isnan("CPI")).count() == 0, attempt
            # count() must treat it as missing (priced_rows semantics)
            assert (
                dash.agg(F.count("CPI").alias("c")).collect()[0]["c"] == 0
            ), attempt


def test_load_raw_grid_sniffs_format(tmp_path):
    """CSV fixtures parse as headerless integer-labeled grids; a zip-magic
    (xlsx) file routes to the Excel engine — with an actionable error when
    that engine is absent in this environment."""
    p = tmp_path / "raw_csv"
    p.write_bytes(b"junk,1,2\n3,4,5\n")
    grid = cs.load_raw_grid(str(p))
    assert list(grid.columns) == [0, 1, 2] and grid.loc[1, 2] == 5
    x = tmp_path / "raw_xlsx"
    x.write_bytes(b"PK\x03\x04not really a workbook")
    try:
        cs.load_raw_grid(str(x))
    except ImportError as exc:
        assert "openpyxl" in str(exc)
    except Exception:
        pass  # an Excel engine exists and rejected the fake zip — fine
