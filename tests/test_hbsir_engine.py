"""End-to-end tests of the HBSIR-parity engine against synthetic fixtures,
with DuckDB as the oracle for every numeric pipeline (SURVEY §5 test plan:
golden pipeline, per-operator oracle checks, multi-year load matrix)."""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_fixtures import YEARS, write_fixture_parquet  # noqa: E402
from hbsir_old_spark.api import HBSIREngine, parquet_base_loader  # noqa: E402
from hbsir_old_spark.plans.filters import translate_pandas_query  # noqa: E402
from hbsir_old_spark.sources.cleaner import clean_table  # noqa: E402


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("hbsir_fixtures"))
    write_fixture_parquet(root)
    return root


@pytest.fixture(scope="module")
def engine(spark, fixture_root, tmp_path_factory):
    cache_dir = str(tmp_path_factory.mktemp("hbsir_cache"))
    return HBSIREngine(
        spark,
        base_loader=parquet_base_loader(spark, fixture_root),
        cache_dir=cache_dir,
    )


@pytest.fixture(scope="module")
def oracle(fixture_root):
    con = duckdb.connect()
    for fname in os.listdir(fixture_root):
        if fname.endswith(".parquet"):
            year, table = fname[:-8].split("_", 1)
            view = f"{table}_{year}"
            con.execute(
                f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{fixture_root}/{fname}')"
            )
    # multi-year views
    for table in ("food", "durable", "household_information", "members_properties",
                  "other_income", "weights", "employment_income",
                  "self_employed_income", "subsidy", "house_specifications"):
        parts = [
            f"SELECT * FROM {table}_{y}" for y in YEARS
            if os.path.exists(f"{fixture_root}/{y}_{table}.parquet")
        ]
        con.execute(f"CREATE VIEW {table} AS " + " UNION ALL ".join(parts))
    return con


def _norm(frame):
    frame = frame.reindex(sorted(frame.columns), axis=1)
    return frame.sort_values(by=list(frame.columns)).reset_index(drop=True)


def assert_frames_match(spark_df, duck_df, tol=1e-9):
    left = _norm(spark_df.toPandas())
    right = _norm(duck_df)
    assert list(left.columns) == list(right.columns), (list(left.columns), list(right.columns))
    assert len(left) == len(right), (len(left), len(right))
    for c in left.columns:
        lv, rv = left[c], right[c]
        if str(lv.dtype).startswith("float") or str(rv.dtype).startswith("float"):
            diffs = (lv.fillna(-1e30) - rv.fillna(-1e30)).abs()
            assert (diffs < tol).all(), f"{c}: max diff {diffs.max()}"
        else:
            assert (lv.fillna("-").astype(str) == rv.fillna("-").astype(str)).all(), c


class TestLoadTable:
    def test_original_table_multi_year(self, engine, oracle):
        df = engine.load_table("food", [1394, 1400])
        expected = oracle.sql("SELECT count(*) n FROM food WHERE Year IN (1394, 1400)").df()
        assert df.count() == int(expected.n[0])

    def test_year_versioned_table_list(self, engine):
        # 1375 resolves table_list to [food]; 1394/1400 to [food, durable]
        only_food = engine.load_table("Original_Expenditures", 1375)
        both = engine.load_table("Original_Expenditures", 1394)
        assert only_food.filter(F.col("Code") >= 30000).count() == 0
        assert both.filter(F.col("Code") >= 30000).count() > 0

    def test_filter_and_computed_column(self, engine, oracle):
        df = engine.load_table("Expenditures", [1400]).select(
            "Year", "ID", "Code", "Yearly_Expenditure"
        )
        expected = oracle.sql(
            """
            SELECT Year, ID, Code, coalesce(Expenditure, 0) / Duration * 360 AS Yearly_Expenditure
            FROM (SELECT * FROM food_1400 UNION ALL BY NAME SELECT * FROM durable_1400)
            WHERE Code NOT IN (18888, 19993)
            """
        ).df()
        assert_frames_match(df, expected)

    def test_total_expenditure_cached(self, engine, oracle):
        df = engine.load_table("Total_Expenditure", [1394, 1400])
        expected = oracle.sql(
            """
            SELECT Year, ID,
                   sum(coalesce(Expenditure, 0)) AS Gross_Expenditure,
                   sum(coalesce(Expenditure, 0) / Duration * 360) AS Yearly_Expenditure
            FROM (SELECT * FROM food UNION ALL BY NAME SELECT * FROM durable)
            WHERE Code NOT IN (18888, 19993) AND Year IN (1394, 1400)
            GROUP BY Year, ID
            """
        ).df()
        assert_frames_match(df, expected)
        # second load hits the fingerprint cache (parquet written)
        cached_files = os.listdir(engine.registry.cache.root)
        assert any("Total_Expenditure" in f and f.endswith(".meta.json") for f in cached_files)
        df2 = engine.load_table("Total_Expenditure", [1394, 1400])
        assert df2.count() == df.count()

    @staticmethod
    def income_long_sql(keys: str = "Year, ID") -> str:
        """The four-source income union, parameterized on the grouping keys
        so the household- and member-level oracles share one definition."""
        return f"""
            WITH long AS (
              SELECT {keys}, val FROM other_income
              UNPIVOT (val FOR kind IN (Retirement, Rent, Interest, Aid, Home_Production, Transfer))
              WHERE val > 0
              UNION ALL
              SELECT {keys}, Yearly_Net_Income FROM employment_income
              WHERE Yearly_Net_Income > 0
              UNION ALL
              SELECT {keys}, Profit FROM self_employed_income WHERE Profit > 0
              UNION ALL
              SELECT {keys}, Subsidy FROM subsidy WHERE Subsidy > 0 AND Year >= 1390
            )
            SELECT {keys}, sum(val) AS Income FROM long GROUP BY {keys}
        """

    def test_income_chain_all_sources(self, engine, oracle):
        df = engine.load_table("Total_Income", list(YEARS))
        expected = oracle.sql(self.income_long_sql("Year, ID")).df()
        assert_frames_match(df, expected)

    def test_income_breakdown_types(self, engine):
        bd = engine.load_table("Income_Breakdown", [1394])
        types = {r["Income_Type"] for r in bd.select("Income_Type").distinct().collect()}
        assert {"Employment", "Self_Employment", "Subsidy"} <= types
        assert types & {"Retirement", "Aid", "Transfer", "Rent"}

    def test_subsidy_availability_pruned_before_1390(self, engine):
        bd = engine.load_table("Income_Breakdown", [1375])
        types = {r["Income_Type"] for r in bd.select("Income_Type").distinct().collect()}
        assert "Subsidy" not in types
        assert "Employment" in types

    def test_outlay_chain_nets_secondhand_sales(self, engine, oracle):
        df = engine.load_table("Total_Outlay", [1400])
        expected = oracle.sql(
            """
            SELECT Year, ID,
                   sum(coalesce(Expenditure, 0) - coalesce(Secondhand_Sale, 0)) AS Gross_Outlay,
                   sum((coalesce(Expenditure, 0) - coalesce(Secondhand_Sale, 0)) / Duration * 360)
                       AS Yearly_Outlay
            FROM (SELECT * FROM food_1400 UNION ALL BY NAME SELECT * FROM durable_1400)
            WHERE Code NOT IN (18888, 19993)
            GROUP BY Year, ID
            """
        ).df()
        assert_frames_match(df, expected)

    def test_imputed_rent_housing_codes_only(self, engine, oracle):
        df = engine.load_table("Imputed_Rent", [1394, 1400])
        expected = oracle.sql(
            """
            SELECT Year, ID, sum(coalesce(Expenditure, 0)) AS Imputed_Rent
            FROM durable WHERE Code BETWEEN 31100 AND 31999 AND Year IN (1394, 1400)
            GROUP BY Year, ID
            HAVING sum(coalesce(Expenditure, 0)) > 0
            """
        ).df()
        assert_frames_match(df, expected)

    def test_members_income_tables(self, engine, oracle):
        df = engine.load_table("Members_Total_Income", list(YEARS))
        expected = oracle.sql(self.income_long_sql("Year, ID, Member_Number")).df()
        assert_frames_match(df, expected)

    def test_create_table_with_schema(self, engine):
        adhoc = {
            "table_list": ["food"],
            "instructions": [
                {"apply_filter": "Code not in [18888, 19993]"},
                {
                    "aggregate": {
                        "groupby": ["Year", "ID"],
                        "columns": ["Expenditure"],
                        "agg": "sum",
                    }
                },
            ],
        }
        df = engine.create_table_with_schema(adhoc, years=[1400])
        assert set(df.columns) == {"Year", "ID", "Expenditure"}
        assert df.count() > 0

    def test_weights_standard_table(self, engine, oracle):
        w = engine.load_table("Weights", [1375, 1400])
        assert w.columns == ["Year", "ID", "Weight"]
        expected = oracle.sql(
            """
            SELECT h.Year, h.ID, coalesce(w.Weight, hi.Weight) AS Weight
            FROM (SELECT Year, ID FROM house_specifications WHERE Year IN (1375, 1400)) h
            LEFT JOIN weights w ON h.Year = w.Year AND h.ID = w.ID AND h.Year <= 1395
            LEFT JOIN household_information hi
              ON h.Year = hi.Year AND h.ID = hi.ID AND h.Year > 1395
            """
        ).df()
        assert_frames_match(w, expected)

    def test_household_information_pipeline_adds_season(self, engine):
        hh = engine.load_table("household_information", [1400])
        assert "Season" in hh.columns
        rows = hh.select("Month", "Season").collect()
        for r in rows:
            if r["Month"] in (1, 2):
                assert r["Season"] == "Spring"
            if r["Month"] == 12:
                assert r["Season"] is None  # documented reference quirk

    def test_availability_pruning(self, spark, engine, fixture_root):
        eng = HBSIREngine(
            spark,
            base_loader=parquet_base_loader(spark, fixture_root),
            schema={"food": {"years": {"start": 1390, "end": 1402}, "instructions": []}},
        )
        df = eng.load_table("food", [1375, 1394, 1400])
        assert df.select("Year").distinct().count() == 2


class TestDecoders:
    def test_attribute_decode(self, engine, oracle):
        df = engine.add_attribute(
            engine.load_table("household_information", [1375, 1400]), "Urban_Rural"
        )
        # digit 0 of the ID encodes urban(1)/rural(2) for both ID widths
        expected = oracle.sql(
            """
            SELECT Year, ID,
                   CASE (ID // CASE WHEN Year >= 1392 THEN 10000000000 ELSE 10000000 END)
                        WHEN 1 THEN 'Urban' WHEN 2 THEN 'Rural' END AS Urban_Rural
            FROM household_information WHERE Year IN (1375, 1400)
            """
        ).df()
        assert_frames_match(df.select("Year", "ID", "Urban_Rural"), expected)

    def test_select_filters_without_helper_column(self, engine):
        hh = engine.load_table("household_information", [1400])
        urban = engine.select(hh, "Urban_Rural", ["Urban"])
        assert "Urban_Rural" not in urban.columns
        assert 0 < urban.count() < hh.count()

    def test_classification_levels_and_defaults(self, engine, oracle):
        food = engine.load_table("food", [1400])
        classified = engine.add_classification(food, "original")
        got = classified.filter(F.col("Code") == 11150).select("item_key_1", "item_key_2").distinct()
        rows = got.collect()
        assert rows[0]["item_key_1"] == "food" and rows[0]["item_key_2"] == "cereals"

    def test_food_nonfood_missing_default(self, engine):
        exp = engine.load_table("Original_Expenditures", [1400])
        classified = engine.add_classification(exp, "Food_NonFood")
        kinds = {r["item_key"] for r in classified.select("item_key").distinct().collect()}
        assert kinds == {"Food", "Non-Food"}


class TestEnrichment:
    def test_weights_both_sources(self, engine, oracle):
        te = engine.load_table("Total_Expenditure", [1394, 1400])
        weighted = engine.add_weight(te)
        expected = oracle.sql(
            """
            WITH te AS (
              SELECT Year, ID FROM (SELECT * FROM food UNION ALL BY NAME SELECT * FROM durable)
              WHERE Code NOT IN (18888, 19993) AND Year IN (1394, 1400) GROUP BY Year, ID
            )
            SELECT te.Year, te.ID,
                   coalesce(w.Weight, h.Weight) AS Weight
            FROM te
            LEFT JOIN weights w ON te.Year = w.Year AND te.ID = w.ID AND te.Year <= 1395
            LEFT JOIN household_information h ON te.Year = h.Year AND te.ID = h.ID AND te.Year > 1395
            """
        ).df()
        assert_frames_match(weighted.select("Year", "ID", "Weight"), expected)

    def test_equivalence_scale_adjustment(self, engine, oracle):
        te = engine.load_table("Total_Expenditure", [1400])
        adjusted = engine.adjust_by_equivalence_scale(te, ["Gross_Expenditure"], scale="OECD")
        expected = oracle.sql(
            """
            WITH te AS (
              SELECT Year, ID, sum(coalesce(Expenditure, 0)) AS gross
              FROM (SELECT * FROM food_1400 UNION ALL BY NAME SELECT * FROM durable_1400)
              WHERE Code NOT IN (18888, 19993) GROUP BY Year, ID
            ), nm AS (
              SELECT Year, ID, count(Member_Number) AS members,
                     sum(CASE WHEN Age >= 14 THEN 1 ELSE 0 END) AS adults
              FROM members_properties_1400 GROUP BY Year, ID
            )
            SELECT te.Year, te.ID,
                   te.gross / (0.7 * nm.adults + 0.3 + 0.5 * (nm.members - nm.adults))
                       AS Gross_Expenditure
            FROM te JOIN nm ON te.Year = nm.Year AND te.ID = nm.ID
            """
        ).df()
        assert_frames_match(adjusted.select("Year", "ID", "Gross_Expenditure"), expected)

    def test_add_cpi_auto_attaches_urban_rural(self, spark, engine):
        # Reference api.py:505-517: with the default urban/rural CPI, a
        # fact table lacking Urban_Rural gets it derived via the attribute
        # registry for the join and dropped afterwards.
        te = engine.load_table("Total_Expenditure", [1400])
        assert "Urban_Rural" not in te.columns
        cpi = spark.createDataFrame(
            [("Urban", 1400, 100.0), ("Rural", 1400, 50.0)],
            schema="Urban_Rural string, Year int, CPI double",
        )

        class _FakeExternal:
            def load_named(self, *a, **k):
                return cpi

        old = engine.external
        engine.external = _FakeExternal()
        try:
            out = engine.add_cpi(te)
        finally:
            engine.external = old
        assert "Urban_Rural" not in out.columns and "CPI" in out.columns
        decoded = engine.add_attribute(te, "Urban_Rural")
        exp = {
            (r["Year"], r["ID"]): 100.0 if r["Urban_Rural"] == "Urban" else 50.0
            for r in decoded.select("Year", "ID", "Urban_Rural").collect()
        }
        got = out.select("Year", "ID", "CPI").collect()
        assert got and all(r["CPI"] == exp[(r["Year"], r["ID"])] for r in got)

    def test_cpi_deflation(self, spark, engine):
        te = engine.load_table("Total_Expenditure", [1394, 1400])
        cpi = spark.createDataFrame(
            [(1394, 50.0), (1400, 100.0)], schema="Year int, CPI double"
        )
        real = engine.adjust_by_cpi(te, cpi, ["Gross_Expenditure"])
        nominal = {(r["Year"], r["ID"]): r["Gross_Expenditure"] for r in te.collect()}
        for r in real.collect():
            factor = 2.0 if r["Year"] == 1394 else 1.0
            assert abs(r["Gross_Expenditure"] - nominal[(r["Year"], r["ID"])] * factor) < 1e-9


class TestGoldenPipeline:
    """The README-walkthrough analog: per-class weighted mean yearly food
    expenditure for urban households, by year (reference
    test_by_examples.py:7-69 shape)."""

    def test_weighted_class_means(self, engine, oracle):
        exp = engine.load_table("Expenditures", list(YEARS))
        classified = engine.add_classification(exp, "Food_NonFood")
        urban = engine.select(classified, "Urban_Rural", ["Urban"])
        per_hh = urban.groupBy("Year", "ID", "item_key").agg(
            F.sum("Yearly_Expenditure").alias("Yearly_Expenditure")
        )
        weighted = engine.add_weight(per_hh)
        result = engine.average_table(
            weighted, value_cols=["Yearly_Expenditure"], groupby=["Year", "item_key"]
        )
        expected = oracle.sql(
            """
            WITH exp AS (
              -- durable joins the table_list only from 1380 (year-versioned schema)
              SELECT Year, ID, Code, coalesce(Expenditure, 0) / Duration * 360 AS yearly
              FROM (SELECT * FROM food
                    UNION ALL BY NAME SELECT * FROM durable WHERE Year >= 1380)
              WHERE Code NOT IN (18888, 19993)
            ), classified AS (
              SELECT Year, ID,
                     CASE WHEN Code BETWEEN 11100 AND 19999 THEN 'Food' ELSE 'Non-Food' END AS item_key,
                     yearly
              FROM exp
              WHERE (ID // CASE WHEN Year >= 1392 THEN 10000000000 ELSE 10000000 END) = 1
            ), per_hh AS (
              SELECT Year, ID, item_key, sum(yearly) AS yearly FROM classified GROUP BY 1, 2, 3
            ), wt AS (
              SELECT p.*, coalesce(w.Weight, h.Weight) AS Weight FROM per_hh p
              LEFT JOIN weights w ON p.Year = w.Year AND p.ID = w.ID AND p.Year <= 1395
              LEFT JOIN household_information h ON p.Year = h.Year AND p.ID = h.ID AND p.Year > 1395
            )
            SELECT Year, item_key, sum(yearly * Weight) / sum(Weight) AS Yearly_Expenditure
            FROM wt GROUP BY Year, item_key
            """
        ).df()
        assert_frames_match(result, expected, tol=1e-6)

    def test_decile_assignment(self, engine, oracle):
        te = engine.add_weight(engine.load_table("Total_Expenditure", [1400]))
        deciles = engine.add_decile(te, "Yearly_Expenditure")
        expected = oracle.sql(
            """
            WITH te AS (
              SELECT Year, ID, sum(coalesce(Expenditure, 0) / Duration * 360) AS yearly
              FROM (SELECT * FROM food_1400 UNION ALL BY NAME SELECT * FROM durable_1400)
              WHERE Code NOT IN (18888, 19993) GROUP BY Year, ID
            ), wt AS (
              SELECT te.*, h.Weight FROM te
              JOIN household_information_1400 h ON te.Year = h.Year AND te.ID = h.ID
            )
            SELECT Year, ID,
                   least(greatest(floor(
                     sum(Weight) OVER (PARTITION BY Year ORDER BY yearly, ID
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     / sum(Weight) OVER (PARTITION BY Year) * 10) + 1, 1), 10)::INTEGER AS Decile
            FROM wt
            """
        ).df()
        assert_frames_match(deciles.select("Year", "ID", "Decile"), expected)


class TestPresentation:
    def test_pivot_with_total_row(self, engine, oracle):
        """The reference golden test's presentation shape: urban/rural
        weighted means pivoted to columns plus a 'Total' row (union-of-
        totals, SURVEY §2.5 note)."""
        from hbsir_old_spark.operators.reshape import pivot_table, union_tables

        exp = engine.load_table("Expenditures", [1400])
        cls = engine.add_classification(exp, "Food_NonFood")
        attributed = engine.add_attribute(cls, "Urban_Rural")
        per_hh = attributed.groupBy("Year", "ID", "Urban_Rural", "item_key").agg(
            F.sum("Yearly_Expenditure").alias("Yearly_Expenditure")
        )
        weighted = engine.add_weight(per_hh)
        means = engine.average_table(
            weighted,
            value_cols=["Yearly_Expenditure"],
            groupby=["Urban_Rural", "item_key"],
        )
        wide = pivot_table(
            means, group_cols=("item_key",), pivot_col="Urban_Rural",
            value_col="Yearly_Expenditure", agg="first",
            pivot_values=("Urban", "Rural"),
        )
        total = wide.groupBy().agg(
            F.lit("Total").alias("item_key"),
            F.sum("Urban").alias("Urban"),
            F.sum("Rural").alias("Rural"),
        )
        report = union_tables([wide, total])
        rows = {r["item_key"]: r for r in report.collect()}
        assert set(rows) == {"Food", "Non-Food", "Total"}
        assert abs(rows["Total"]["Urban"] - (rows["Food"]["Urban"] + rows["Non-Food"]["Urban"])) < 1e-9

        expected = oracle.sql(
            """
            WITH exp AS (
              SELECT Year, ID, Code, coalesce(Expenditure, 0) / Duration * 360 AS yearly,
                     CASE (ID // 10000000000) WHEN 1 THEN 'Urban' ELSE 'Rural' END AS ur
              FROM (SELECT * FROM food_1400 UNION ALL BY NAME SELECT * FROM durable_1400)
              WHERE Code NOT IN (18888, 19993)
            ), per_hh AS (
              SELECT Year, ID, ur,
                     CASE WHEN Code BETWEEN 11100 AND 19999 THEN 'Food' ELSE 'Non-Food' END AS k,
                     sum(yearly) AS y
              FROM exp GROUP BY 1, 2, 3, 4
            ), wt AS (
              SELECT p.*, h.Weight FROM per_hh p
              JOIN household_information_1400 h ON p.Year = h.Year AND p.ID = h.ID
            )
            SELECT ur, k, sum(y * Weight) / sum(Weight) AS mean FROM wt GROUP BY ur, k
            """
        ).df()
        for _, row in expected.iterrows():
            assert abs(rows[row["k"]][row["ur"]] - row["mean"]) < 1e-6


class TestCleaner:
    def test_clean_table_compiles_types(self, spark):
        raw = spark.createDataFrame(
            [("1", " 25 ", "3", "1", "x,y"), ("2", "abc", "1", "0", "-z")],
            schema="ADRS string, age string, TENURE string, lit string, note string",
        )
        meta = {
            "columns": {
                "ADRS": {"new_name": "ID", "type": "unsigned"},
                "age": {"new_name": "Age", "type": "float", "replace": {"abc": "7"}},
                "TENURE": {
                    "new_name": "Tenure",
                    "type": "category",
                    "categories": {1: "Owned", 3: "Rent"},
                },
                "lit": {"new_name": "Is_Literate", "type": "boolean", "true_condition": 1},
                "note": "drop",
            },
            "missings": "error",
        }
        out = clean_table(raw, meta, year=1400)
        rows = {r["ID"]: r for r in out.collect()}
        assert out.columns == ["ID", "Age", "Tenure", "Is_Literate"]
        assert rows[1]["Age"] == 25.0 and rows[2]["Age"] == 7.0
        assert rows[1]["Tenure"] == "Rent" and rows[2]["Tenure"] == "Owned"
        assert rows[1]["Is_Literate"] is True and rows[2]["Is_Literate"] is False

    def test_missings_policies(self, spark):
        raw = spark.createDataFrame([("1", "x")], schema="a string, junk string")
        base = {"columns": {"a": {"new_name": "A"}}}
        with pytest.raises(KeyError):
            clean_table(raw, {**base, "missings": "error"}, 1400)
        assert clean_table(raw, {**base, "missings": "drop"}, 1400).columns == ["A"]
        assert clean_table(raw, {**base, "missings": "keep"}, 1400).columns == ["A", "junk"]

    def test_year_versioned_columns(self, spark):
        raw = spark.createDataFrame([("5",)], schema="code string")
        meta = {
            "columns": {
                "code": {
                    "versions": {
                        1363: {"new_name": "Old_Code", "type": "unsigned"},
                        1390: {"new_name": "Code", "type": "unsigned"},
                    }
                }
            }
        }
        assert clean_table(raw, meta, 1380).columns == ["Old_Code"]
        assert clean_table(raw, meta, 1400).columns == ["Code"]


class TestQueryTranslator:
    @pytest.mark.parametrize(
        "pandas_expr,sql",
        [
            ("Code not in [18888, 19993]", "Code NOT IN (18888, 19993)"),
            ("Other_Incomes > 0", "Other_Incomes > 0"),
            (
                "Imputed_Rent.notnull() & (Imputed_Rent > 0)",
                "Imputed_Rent IS NOT NULL AND (Imputed_Rent > 0)",
            ),
            ("A == 1 | ~(B in [1, 2])", "A = 1 OR NOT (B IN (1, 2))"),
            ("`my col`.isnull()", "`my col` IS NULL"),
        ],
    )
    def test_translate(self, pandas_expr, sql):
        assert translate_pandas_query(pandas_expr) == sql


class TestSqlSurface:
    def test_register_views_and_sql(self, engine):
        out = engine.sql(
            "SELECT Year, count(*) AS n FROM Expenditures GROUP BY Year ORDER BY Year",
            years=[1394, 1400],
        )
        rows = {r["Year"]: r["n"] for r in out.collect()}
        assert set(rows) == {1394, 1400}
        assert all(n > 0 for n in rows.values())

    def test_sql_view_keeps_catalyst_visibility(self, engine):
        # pruning must survive the SQL boundary: selecting one column
        # through the view should not widen the underlying scans
        engine.register_views(["Expenditures"], years=[1400])
        plan = (
            engine.spark.sql("SELECT Year FROM Expenditures")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        assert "Amount" not in plan

    def test_sql_word_boundary_table_detection(self, engine):
        # `Expenditures` is a substring of `Original_Expenditures`; naming
        # only the latter must register exactly one view, not both
        engine.spark.catalog.dropTempView("Expenditures")
        engine.sql(
            "SELECT count(*) AS n FROM Original_Expenditures", years=[1400]
        ).collect()
        assert engine.spark.catalog.tableExists("Original_Expenditures")
        assert not engine.spark.catalog.tableExists("Expenditures")

    def test_sql_explicit_tables(self, engine):
        out = engine.sql(
            "SELECT count(*) AS n FROM food", years=[1400], tables=["food"]
        )
        assert out.collect()[0]["n"] > 0
