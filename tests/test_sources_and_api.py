"""Tests: external-data registry (goto/alias/from resolution), raw CSV
urban/rural loading + clean chain (S1), quantile-by-variable (W3), and the
view accessor sugar (P22)."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_fixtures import write_fixture_parquet  # noqa: E402
from hbsir_old_spark.api import HBSIREngine, parquet_base_loader  # noqa: E402
from hbsir_old_spark.sources.cleaner import clean_table, load_raw_csv  # noqa: E402
from hbsir_old_spark.sources.external import ExternalDataRegistry  # noqa: E402


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fixtures2"))
    write_fixture_parquet(root)
    return HBSIREngine(spark, base_loader=parquet_base_loader(spark, root))


class TestExternalRegistry:
    METADATA = {
        "counties": "manual",
        "cpi": {"goto": "sci.cpi_1400"},
        "sci": {
            "cpi_1400": {
                "alias": "annual",
                "annual": {"from": "sci.cpi_raw"},
                "monthly": "manual",
            },
            "cpi_raw": "manual",
        },
    }

    def _registry(self, spark, tmp_path=None):
        cpi_raw = pd.DataFrame({"Year": [1394, 1400], "CPI": [50.0, 100.0]})
        counties = pd.DataFrame({"code": [1001], "name": ["TestCounty"]})

        def clean_annual(raw):
            # single-source 'from' entries receive the bare frame
            return raw.assign(CPI=raw.CPI * 1.0)

        return ExternalDataRegistry(
            spark,
            self.METADATA,
            cleaners={"sci_cpi_1400_annual": clean_annual},
            manual_tables={
                "counties": counties,
                "sci.cpi_raw": cpi_raw,
                "sci.cpi_1400.monthly": cpi_raw.assign(Month=1),
            },
            cache_dir=str(tmp_path) if tmp_path else None,
        )

    def test_manual_dataset(self, spark):
        df = self._registry(spark).load("counties")
        assert df.collect()[0]["name"] == "TestCounty"

    def test_goto_alias_from_chain(self, spark):
        # cpi -> goto sci.cpi_1400 -> alias annual -> from sci.cpi_raw -> cleaner
        df = self._registry(spark).load("cpi")
        rows = {r["Year"]: r["CPI"] for r in df.collect()}
        assert rows == {1394: 50.0, 1400: 100.0}

    def test_goto_with_remainder(self, spark):
        df = self._registry(spark).load("cpi.monthly")  # goto + appended part
        assert df is not None

    def test_cache_roundtrip(self, spark, tmp_path):
        reg = self._registry(spark, tmp_path)
        reg.load("cpi")
        assert os.path.exists(os.path.join(str(tmp_path), "sci.cpi_1400.annual.parquet"))
        again = reg.load("cpi")
        assert again.count() == 2

    def test_missing_dataset_errors(self, spark):
        with pytest.raises(KeyError):
            self._registry(spark).load("nope.nothing")

    def test_url_fetch_error_propagates(self, spark, tmp_path):
        # the default fetcher really fetches (urllib); an unreachable URL
        # surfaces the underlying error instead of silently proceeding
        missing = (tmp_path / "does-not-exist.xlsx").as_uri()
        reg = ExternalDataRegistry(
            spark,
            {"x": {"url": missing}},
            cleaners={"x": lambda p: None},
            cache_dir=str(tmp_path / "c"),
        )
        with pytest.raises(OSError):
            reg.load("x")


class TestRawCsv:
    def test_urban_rural_union_and_clean(self, spark, tmp_path):
        urban = tmp_path / "U00.csv"
        rural = tmp_path / "R00.csv"
        urban.write_text("ADRS,G01\n10001,5\n10002,7\n")
        rural.write_text("ADRS,G01,EXTRA\n20001,3,x\n")
        raw = load_raw_csv(spark, str(urban), str(rural))
        assert raw.count() == 3
        assert set(raw.columns) == {"ADRS", "G01", "EXTRA", "Urban_Rural"}
        meta = {
            "columns": {
                "ADRS": {"new_name": "ID", "type": "unsigned"},
                "G01": {"new_name": "Grams", "type": "float"},
                "EXTRA": "drop",
                "Urban_Rural": {},
            }
        }
        cleaned = clean_table(raw, meta, 1400)
        rows = {r["ID"]: r for r in cleaned.collect()}
        assert rows[20001]["Urban_Rural"] == "Rural" and rows[10001]["Grams"] == 5.0


class TestLoadTableForms:
    """The reference's form='raw'|'cleaned'|'processed' switch
    (reference api.py:65-97,167-191) wired through the registry."""

    CLEANING = {
        "columns": {
            "ADRS": {"new_name": "ID", "type": "unsigned"},
            "G01": {"new_name": "Grams", "type": "float", "replace": {"7": "70"}},
            "JUNK": "drop",
        },
        "missings": "error",
    }
    SCHEMA = {
        "food": {
            "instructions": [
                {
                    "create_column": {
                        "name": "Kilos",
                        "type": "numerical",
                        "expression": "Grams / 1000",
                    }
                }
            ]
        },
        "Meals": {"table_list": ["food"]},
    }

    def _engine(self, spark, base_loader=None):
        def raw_loader(name, year):
            if name != "food" or year != 1400:
                return None
            return spark.createDataFrame(
                [("10001", "5", "x"), ("10002", "7", "y")],
                ["ADRS", "G01", "JUNK"],
            )

        return HBSIREngine(
            spark,
            base_loader=base_loader,
            schema=self.SCHEMA,
            raw_loader=raw_loader,
            cleaning_metadata={"food": self.CLEANING},
        )

    def test_raw_form_is_untouched(self, spark):
        raw = self._engine(spark).load_table("food", [1400], form="raw")
        assert raw.columns == ["ADRS", "G01", "JUNK"]
        assert {r["G01"] for r in raw.collect()} == {"5", "7"}

    def test_cleaned_form_types_and_replaces(self, spark):
        cleaned = self._engine(spark).load_table("food", [1400], form="cleaned")
        assert cleaned.columns == ["ID", "Grams"]
        rows = {r["ID"]: r["Grams"] for r in cleaned.collect()}
        assert rows == {10001: 5.0, 10002: 70.0}

    def test_processed_form_runs_pipeline_over_raw(self, spark):
        processed = self._engine(spark).load_table("food", [1400], form="processed")
        rows = {r["ID"]: r["Kilos"] for r in processed.collect()}
        assert rows == {10001: 0.005, 10002: 0.07}

    def test_standard_table_rejects_raw_and_cleaned(self, spark):
        engine = self._engine(spark)
        for form in ("raw", "cleaned"):
            with pytest.raises(ValueError, match="standard"):
                engine.load_table("Meals", [1400], form=form)

    def test_unknown_form_rejected(self, spark):
        with pytest.raises(ValueError, match="form"):
            self._engine(spark).load_table("food", [1400], form="original")

    def test_raw_without_loader_rejected(self, spark, engine):
        with pytest.raises(ValueError, match="raw loader"):
            engine.load_table("household_information", [1400], form="raw")

    def test_cleaned_prefers_materialized_base(self, spark):
        def base_loader(name, year):
            if name != "food" or year != 1400:
                return None
            return spark.createDataFrame([(1, 9.0)], ["ID", "Grams"])

        cleaned = self._engine(spark, base_loader).load_table(
            "food", [1400], form="cleaned"
        )
        assert [r["Grams"] for r in cleaned.collect()] == [9.0]

    def test_missing_cleaning_metadata_errors(self, spark):
        def raw_loader(name, year):
            return spark.createDataFrame([("1",)], ["A"])

        engine = HBSIREngine(
            spark, base_loader=None, schema={}, raw_loader=raw_loader
        )
        with pytest.raises(KeyError, match="cleaning metadata"):
            engine.load_table("mystery", [1400], form="cleaned")


class TestQuantileByVariable:
    def test_decile_from_total_expenditure(self, spark, engine):
        hh = engine.load_table("household_information", [1400])
        with_decile = engine.add_quantile_by_variable(
            hh, variable="Gross_Expenditure", bins=10
        )
        deciles = [r["Decile"] for r in with_decile.select("Decile").collect()]
        assert all(d is None or 1 <= d <= 10 for d in deciles)
        assert any(d is not None for d in deciles)

    def test_for_all_false_restricts_population(self, spark, engine):
        hh = engine.load_table("household_information", [1400]).limit(5)
        restricted = engine.add_quantile_by_variable(
            hh, variable="Gross_Expenditure", bins=10, for_all=False
        )
        assert restricted.count() == 5

    def test_equivalence_adjusted_ranking_changes(self, spark, engine):
        hh = engine.load_table("household_information", [1400])
        plain = engine.add_quantile_by_variable(hh, bins=100, out_col="P1")
        adjusted = engine.add_quantile_by_variable(
            hh, bins=100, out_col="P2", equivalence_scale="OECD"
        )
        joined = plain.select("ID", "P1").join(adjusted.select("ID", "P2"), "ID")
        diffs = joined.filter(F.col("P1") != F.col("P2")).count()
        assert diffs > 0  # per-capita ranking reorders households


class TestViewSugar:
    def test_view_accessor(self, spark, engine):
        food = engine.load_table("food", [1400])
        classified = engine.frame(food).view.Food_NonFood
        assert "item_key" in classified.columns
        classified2 = engine.frame(food).view["original"]
        assert "item_key_1" in classified2.columns


def test_jsonl_schema_enforced_corrupt_capture(spark, tmp_path):
    """read_jsonl: enforced schema (no inference), malformed lines captured
    in the corrupt column with data columns null, clean rows typed."""
    from pyspark.sql import types as T

    from hbsir_old_spark.sources.jsonl import read_jsonl, split_corrupt

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "lang": "en"}\n'
        '{"doc_id": 2, "lang": "de"}\n'
        "{broken\n"
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    raw = read_jsonl(spark, str(p), schema).cache()
    try:
        good, bad = split_corrupt(raw)
        assert {r["doc_id"] for r in good.collect()} == {1, 2}
        assert good.schema["doc_id"].dataType == T.LongType()
        bad_rows = bad.collect()
        assert len(bad_rows) == 1
        assert bad_rows[0]["_corrupt_record"] == "{broken"
        assert bad_rows[0]["doc_id"] is None
    finally:
        raw.unpersist()


def test_scrub_string_matches_reference_regex_chain(spark):
    """Round-6 review: the translate/rtrim/guarded-regex rewrite of
    scrub_string must stay byte-identical to the reference's original
    four-regex chain (data_cleaner.py:216-227) on every rule it rewrote —
    char-class strip, middle-dot map, trailing-dot strip, leading-minus
    lookahead, blank -> null. The expected values come from an in-test
    Python implementation of the ORIGINAL regexes, so a future edit to
    the hot scrubber cannot regress a rule silently."""
    import re

    import pyspark.sql.functions as F

    from hbsir_old_spark.sources.cleaner import scrub_string

    def reference_scrub(v):
        v = re.sub(r"[\n\r,@+*\[\]_?]", "", v)
        v = re.sub("·", ".", v)
        v = re.sub(r"\.+$", "", v)
        v = re.sub(r"^-+(?=\D|$)", "", v)
        v = v.strip()
        return v if v != "" else None

    cases = [
        "12,345",            # comma strip
        "a@b+c*d_e?f[g]h",   # full char-class strip
        "12·5",              # middle dot -> decimal point
        "128.000...",        # trailing dots
        "12.5.",             # single trailing dot after decimal
        "-",                 # lone minus -> blank -> null
        "--abc",             # minus run before non-digit
        "-5",                # negative number PRESERVED
        "--5",               # backtracking: one minus consumed, -5 stays
        "-.5",               # minus before dot (non-digit lookahead)
        "  padded  ",        # whitespace trim
        "...",               # dots only -> null
        "·",                 # middle dot alone -> '.' -> trailing strip -> null
        "12\n34\r56",        # embedded newlines/CRs
        "a-b-c",             # interior minus untouched
        "",                  # empty -> null
        "0",                 # plain digit
        "12.5 ",             # trailing dot rule must NOT fire past a space
    ]
    df = spark.createDataFrame([(c,) for c in cases], "v string")
    got = [r[0] for r in df.select(scrub_string("v")).collect()]
    expected = [reference_scrub(c) for c in cases]
    assert got == expected, list(zip(cases, got, expected))
