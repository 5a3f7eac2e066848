"""Tests for the ported reference metadata corpus and its loader.

Covers the round-5 verdict asks: the `{{placeholder}}` template
interpreter, the local-metadata override hook, the `_instruction.yaml`
resolution fixtures (ported from
/root/reference/tests/test_package/utils/test_metadata_utils.py), the
tables.yaml cleaning adapter, the household.yaml attribute adapter (mapping
drift at 1387, County null spans), and occupation-scale classification
dims (verdict #6).
"""

from __future__ import annotations

import os

import pytest

from hbsir_old_spark.metadata.corpus import (
    engine_classifications,
    engine_cleaning_metadata,
    engine_household,
    engine_schema,
    interpret_placeholders,
    load_corpus,
    open_yaml,
    PACKAGE_YAML_DIR,
)
from hbsir_old_spark.metadata.versioning import categorize_items, resolve_versioned


@pytest.fixture(scope="module")
def corpus():
    return load_corpus()


# -- _instruction.yaml: the reference's own resolver fixtures ---------------


class TestInstructionFixtures:
    """Ported from the reference's metadata-utils test: every `<name>`
    notation in _instruction.yaml must resolve, per year band, to its
    `<name>_<band>` interpretation (test_metadata_utils.py:96-200)."""

    @pytest.fixture(scope="class")
    def inst(self):
        return open_yaml(PACKAGE_YAML_DIR / "_instruction.yaml")

    @pytest.mark.parametrize(
        "name,bands",
        [
            ("simple_versioned", [(1350, "0"), (1360, "1360"), (1380, "1380")]),
            ("keyword_versioned", [(1350, "0"), (1360, "1360"), (1380, "1380")]),
            (
                "sample_1",
                [(1350, "0"), (1360, "1360"), (1370, "1370"), (1380, "1380")],
            ),
            (
                "sample_2",
                [(1350, "0"), (1360, "1360"), (1370, "1370"), (1380, "1380")],
            ),
            (
                "sample_3",
                [
                    (1350, "0"),
                    (1360, "1360"),
                    (1370, "1370"),
                    (1375, "1375"),
                    (1380, "1380"),
                ],
            ),
        ],
    )
    def test_notation_resolves_to_interpretation(self, inst, name, bands):
        for (start, tag), nxt in zip(bands, [*bands[1:], (1400, None)]):
            expected = inst[f"{name}_{tag}"]
            for year in range(start, nxt[0]):
                assert resolve_versioned(inst[name], year) == expected, (
                    name,
                    year,
                )

    def test_categorized_opens_to_item_records(self, inst):
        resolved = categorize_items(inst["categorized"], 1400)
        expected = inst["categorized_opened"]
        assert resolved["items"] == expected["items"]
        for key in ("key1", "key2", "key3"):
            assert resolved[key] == expected[key]


# -- the {{placeholder}} interpreter ----------------------------------------


class TestPlaceholderInterpreter:
    def test_whole_and_dotted_splice(self):
        text = (
            "base:\n"
            "  items:\n"
            "    alpha: {code: {start: 1, end: 5}}\n"
            "    beta: {code: {start: 7, end: 9}}\n"
            "derived:\n"
            "  items: {{base}}\n"
            "one:\n"
            "  code: {{ base.alpha }}\n"
        )
        import yaml

        data = yaml.safe_load(interpret_placeholders(text))
        assert data["derived"]["items"]["alpha"]["code"] == {"start": 1, "end": 5}
        assert data["one"]["code"]["code"] == {"start": 1, "end": 5}

    def test_malformed_placeholder_raises(self):
        with pytest.raises(ValueError):
            interpret_placeholders("x: {{a.b.c}}\na:\n  items: {b: 1}\n")

    def test_real_commodities_splice(self, corpus):
        fnf = corpus.commodities["Food_NonFood"]
        resolved = categorize_items(fnf, 1400)
        by_key = {}
        for item in resolved["items"]:
            by_key.setdefault(item["item_key"], item)
        # Food's code list = the three spliced original_1383 item dicts
        # (commodities.yaml:1823-1825); each carries its own code range
        assert isinstance(by_key["Food"]["code"], list)
        assert len(by_key["Food"]["code"]) == 3
        assert by_key["Food"]["code"][0]["code"] == {"start": 10000, "end": 20000}
        assert "code" not in by_key["NonFood"]

    def test_sci_coicop_items_are_year_versioned_splices(self, corpus):
        items_1363 = categorize_items(corpus.commodities["original"], 1370)[
            "items"
        ]
        items_1383 = categorize_items(corpus.commodities["original"], 1390)[
            "items"
        ]
        keys_63 = {i["item_key"] for i in items_1363}
        keys_83 = {i["item_key"] for i in items_1383}
        assert "food_beverages_and_tobacco" in keys_63
        assert "food_and_non_alcoholic_beverages" in keys_83
        assert keys_63 != keys_83


# -- local-metadata override hook -------------------------------------------


class TestLocalOverride:
    def test_top_level_update_and_package_context(self, tmp_path):
        (tmp_path / "commodities.yaml").write_text(
            "my_custom:\n"
            "  defaults: {levels: [1]}\n"
            "  items:\n"
            "    my_food:\n"
            "      level: 1\n"
            "      code:\n"
            "        - {{original_1383.food_and_non_alcoholic_beverages}}\n"
        )
        (tmp_path / "household.yaml").write_text("ID_Length: {1363: 4}\n")
        corpus = load_corpus(local_dir=tmp_path)
        # local classification resolves placeholders against PACKAGE context
        cls = engine_classifications(corpus.commodities)
        assert "my_custom" in cls and "Food_NonFood" in cls
        item = categorize_items(cls["my_custom"], 1400)["items"][0]
        assert item["code"][0]["code"] == {"start": 10000, "end": 20000}
        # local household.yaml replaces the ID_Length key, keeps the rest
        assert corpus.household["ID_Length"] == {1363: 4}
        assert "Urban_Rural" in corpus.household

    def test_no_local_dir_is_package_corpus(self, corpus):
        assert corpus.household["ID_Length"][1392] == 11


# -- adapters ----------------------------------------------------------------


class TestAdapters:
    def test_household_positions_and_mapping_drift(self, corpus):
        hh = engine_household(corpus.household)
        assert hh["id_length"][1387] == 10
        ur = hh["attributes"]["Urban_Rural"]
        # flat position floored at the first ID_Length year
        assert ur["position"] == {1363: {"start": 0, "end": 1}}
        # versioned mapping kept raw (resolved per boundary by the registry)
        assert ur["mapping"][1363][1] == "Urban"
        assert ur["mapping"][1387][2] == "Rural"
        county = hh["attributes"]["County"]
        assert county["position"][1363] is None
        assert county["position"][1392] == {"start": 1, "end": 5}

    def test_availability_injection(self, corpus):
        schema = engine_schema(corpus.schema, corpus.tables)
        assert schema["food"]["years"] == [{"start": 1363, "end": 1402}]
        assert schema["investment"]["years"] == [
            {"start": 1366, "end": 1375},
            {"start": 1378, "end": 1402},
        ]
        # census_month: a bare year list
        assert {"start": 1390, "end": 1392} in schema["census_month"]["years"]

    def test_cleaning_metadata_shapes(self, corpus):
        cm = engine_cleaning_metadata(corpus.tables)
        food = resolve_versioned(cm["food"], 1398)
        cols = {
            k: v.get("new_name")
            for k, v in food["columns"].items()
            if isinstance(v, dict)
        }
        assert cols["ADDRESS"] == "ID" and cols["COL4"] == "Grams"
        # durable's columns dict is year-versioned at the top; 1398 resolves
        # to the 1388 DYCOL layout
        durable = resolve_versioned(cm["durable"], 1398)
        dcols = {
            k: v.get("new_name")
            for k, v in durable["columns"].items()
            if isinstance(v, dict)
        }
        assert dcols["DYCOL06"] == "Secondhand_Sale"
        assert "COL3" not in dcols

    def test_classification_families(self, corpus):
        commodities = engine_classifications(corpus.commodities)
        occupations = engine_classifications(corpus.occupations)
        assert "Food_NonFood" in commodities and "original" in commodities
        assert set(occupations) == {"isco", "original"}


# -- Spark-side: attribute decode + occupation-scale dims --------------------


class TestCorpusOnSpark:
    def test_urban_rural_mapping_flips_at_1387(self, spark, corpus):
        from hbsir_old_spark.metadata.corpus import build_reference_registry

        reg = build_reference_registry(spark, corpus)
        df = spark.createDataFrame(
            [
                (1380, 112345678),  # 9-digit (1377+), leading 1 => Urban (old map)
                (1380, 12345678),  # leading 0 => Rural (old map)
                (1400, 10000000001),  # 11-digit, leading 1 => Urban (new map)
                (1400, 20000000001),  # leading 2 => Rural (new map)
            ],
            ["Year", "ID"],
        )
        rows = {
            (r["Year"], r["ID"]): r["Urban_Rural"]
            for r in reg.add_attribute(df, "Urban_Rural").collect()
        }
        assert rows[(1380, 112345678)] == "Urban"
        assert rows[(1380, 12345678)] == "Rural"
        assert rows[(1400, 10000000001)] == "Urban"
        assert rows[(1400, 20000000001)] == "Rural"

    def test_county_null_span_and_decode_span(self, spark, corpus):
        from hbsir_old_spark.metadata.corpus import build_reference_registry

        reg = build_reference_registry(spark, corpus)
        df = spark.createDataFrame(
            [(1370, 1234567), (1400, 10012000001)], ["Year", "ID"]
        )
        rows = {
            r["Year"]: r["County"]
            for r in reg.add_attribute(df, "County").collect()
        }
        assert rows[1370] is None  # position null before 1377
        assert rows[1400] is not None  # digits 1-5 = 0012 -> a named county

    def test_occupation_scale_dim_join_and_chain_strategies_agree(self, spark, corpus):
        """Verdict #6, updated for the round-8 cutoff raise (128 -> 4096):
        the real isco classification across several years is a
        multi-thousand-interval dimension. It now compiles to a CASE chain
        by default (measured 2.4x faster at this size); the broadcast
        range-join path — still the strategy past the cutoff — must keep
        producing the same labels when forced."""
        from hbsir_old_spark.metadata.corpus import build_reference_registry
        from hbsir_old_spark.operators.classification import (
            add_classification,
            build_classification_dim,
        )

        reg = build_reference_registry(spark, corpus)
        years = [1385, 1390, 1395, 1400]
        meta = reg.metadata["occupation_classifications"]["isco"]
        dim = build_classification_dim(meta, years=years, aspects=("item_key",))
        level4 = [r for r in dim.rows if r["level"] == 4]
        assert len(level4) >= 1600  # ~436 intervals x 4 years

        df = spark.createDataFrame(
            [(1390, 1120), (1400, 2211), (1400, 5141), (1400, 42)],
            ["Year", "Job_Code"],
        )
        expected = {
            1120: "managing_directors_and_chief_executives",
            2211: "generalist_medical_practitioners",
            5141: "hairdressers",
            42: None,
        }
        # forced join path: broadcast range join, correct real-corpus labels
        joined = add_classification(
            df, dim, code_col="Job_Code", levels=(4,),
            column_names={"item_key": "Occupation"}, strategy="join",
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert {r["Job_Code"]: r["Occupation"] for r in joined.collect()} == expected

        # registry default (auto -> CASE chain at this size): same labels,
        # and the plan carries no join operator at all
        out = reg.add_classification(
            df,
            "isco",
            years=years,
            levels=(4,),
            classification_type="occupation",
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert {r["Job_Code"]: r["Occupation"] for r in out.collect()} == expected

    def test_duration_classification_is_numeric(self, spark, corpus):
        from hbsir_old_spark.metadata.corpus import build_reference_registry

        reg = build_reference_registry(spark, corpus)
        df = spark.createDataFrame(
            [(1365, 11250), (1365, 11150)], ["Year", "Code"]
        )
        out = reg.add_classification(df, "Duration", years=[1365])
        assert dict(out.dtypes)["Duration"] == "bigint"
        rows = {r["Code"]: r["Duration"] for r in out.collect()}
        assert rows[11250] == 30  # cereals (commodities.yaml:36-40)
        assert rows[11150] == 2  # flour/noodle products


# -- pandas-idiom recognizer -------------------------------------------------


class TestPandasIdioms:
    def test_groupby_sum_with_columns(self, spark):
        from hbsir_old_spark.plans.pipeline import PipelineCompiler

        df = spark.createDataFrame(
            [(1400, 1, 2.0, 3.0, 9.0), (1400, 1, 4.0, 5.0, 9.0)],
            ["Year", "ID", "A", "B", "C"],
        )
        out = PipelineCompiler().apply(
            df,
            [
                {
                    "apply_pandas_function": (
                        '.groupby(["Year", "ID"], as_index=False) [["A", "B"]].sum()'
                    )
                }
            ],
            1400,
            "t",
        )
        assert sorted(out.columns) == ["A", "B", "ID", "Year"]
        row = out.collect()[0]
        assert row["A"] == 6.0 and row["B"] == 8.0

    def test_groupby_sum_numeric_only(self, spark):
        from hbsir_old_spark.plans.pipeline import PipelineCompiler

        df = spark.createDataFrame(
            [(1400, 1, 2, 2.0), (1400, 1, 3, 4.0)],
            ["Year", "ID", "Member_Number", "Income"],
        )
        out = PipelineCompiler().apply(
            df,
            [
                {
                    "apply_pandas_function": (
                        '.groupby(["Year", "ID"], as_index=False).sum(numeric_only=True)'
                    )
                }
            ],
            1400,
            "t",
        )
        row = out.collect()[0]
        assert row["Income"] == 6.0 and row["Member_Number"] == 5

    def test_stack_melt_chain(self, spark):
        from hbsir_old_spark.plans.pipeline import PipelineCompiler

        df = spark.createDataFrame(
            [(1400, 1, 2, "x", 10.0, None), (1400, 1, 3, "x", None, 7.0)],
            ["Year", "ID", "Member_Number", "Table_Name", "Wage", "Bonus"],
        )
        out = PipelineCompiler().apply(
            df,
            [
                {
                    "apply_pandas_function": (
                        ".drop(columns=['Table_Name'])"
                        " .set_index(['Year', 'ID', 'Member_Number'])"
                        " .stack() .to_frame() .reset_index()"
                        " .set_axis(['Year', 'ID', 'Member_Number', 'Type', 'Value'],"
                        " axis='columns')"
                    )
                }
            ],
            1400,
            "t",
        )
        rows = {(r["Member_Number"], r["Type"]): r["Value"] for r in out.collect()}
        assert rows == {(2, "Wage"): 10.0, (3, "Bonus"): 7.0}

    def test_unrecognized_chain_raises(self, spark):
        from hbsir_old_spark.plans.pipeline import PipelineCompiler

        df = spark.createDataFrame([(1,)], ["a"])
        with pytest.raises(ValueError, match="unrecognized apply_pandas_function"):
            PipelineCompiler().apply(
                df,
                [{"apply_pandas_function": ".pivot_table(index='a')"}],
                1400,
                "t",
            )


class TestRealExternalData:
    """The REAL external_data.yaml drives the S9 resolver: goto chains,
    aliases, and `from` composition nodes resolve exactly as the reference
    navigates them (external_data.yaml + reference data loading layer).
    Resolution only — no network."""

    def test_cpi_goto_alias_chain(self, spark, corpus):
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        reg = ExternalDataRegistry(spark, corpus.external_data)
        # cpi -> goto cpi_1400 -> goto sci.cpi_1400 -> alias annual
        resolved, meta = reg._navigate("cpi")
        assert resolved == "sci.cpi_1400.annual"
        assert "urban_rural" in meta
        # ...and the urban_rural sub-table aliases to the `from` composition
        resolved, meta = reg._navigate("cpi.urban_rural")
        assert resolved == "sci.cpi_1400.annual.urban_rural"
        assert meta["from"] == [
            "sci.cpi_1400_urban_singleindex.annual",
            "sci.cpi_1400_rural_maingroups.annual",
        ]

    def test_gini_goto_lands_on_url(self, spark, corpus):
        from hbsir_old_spark.sources.external import ExternalDataRegistry

        reg = ExternalDataRegistry(spark, corpus.external_data)
        resolved, meta = reg._navigate("gini.annual")
        assert resolved == "sci.gini.annual"
        assert str(meta["url"]).startswith("https://www.amar.org.ir/")

    def test_manual_datasets_declared(self, corpus):
        assert corpus.external_data["counties"] == "manual"
        assert corpus.external_data["weights"] == "manual"


class TestEngineFacadeOverCorpus:
    def test_with_reference_corpus_decodes_and_classifies(self, spark):
        """The drop-in facade: HBSIREngine.with_reference_corpus wires the
        ported 39-year metadata, so a reference user's add_attribute /
        add_classification calls work without assembling a registry."""
        from pyspark.sql import functions as F

        from hbsir_old_spark.api import HBSIREngine

        engine = HBSIREngine.with_reference_corpus(spark)
        df = spark.createDataFrame(
            [(1400, 1 * 10**10 + 12345678, 11230),   # leading digit 1 = Urban
             (1400, 2 * 10**10 + 87654321, 44120)],  # leading digit 2 = Rural
            "Year int, ID long, Code long",
        )
        out = engine.add_attribute(df, "Urban_Rural")
        out = engine.add_classification(out, "Food_NonFood", years=[1400])
        rows = {r["ID"]: (r["Urban_Rural"], r["Food_NonFood"]) for r in out.collect()}
        vals = sorted(rows.values())
        assert vals == [("Rural", "NonFood"), ("Urban", "Food")]

    def test_with_reference_corpus_local_override(self, spark, tmp_path):
        from hbsir_old_spark.api import HBSIREngine

        (tmp_path / "household.yaml").write_text(
            "Urban_Rural:\n"
            "  code:\n    position:\n      start: 0\n      end: 1\n"
            "  name:\n    1387:\n      1: \"City\"\n      2: \"Countryside\"\n"
        )
        engine = HBSIREngine.with_reference_corpus(
            spark, local_metadata_dir=str(tmp_path)
        )
        df = spark.createDataFrame([(1400, 10**10 + 5)], "Year int, ID long")
        row = engine.add_attribute(df, "Urban_Rural").collect()[0]
        assert row["Urban_Rural"] == "City"


class TestProjectScaffolding:
    """setup_config / setup_metadata (reference api.py:659-693): the two
    named conveniences over the settings cascade + local-override hook."""

    def test_setup_config_roundtrip(self, spark, tmp_path):
        from hbsir_old_spark.api import (
            HBSIREngine,
            load_settings_file,
            setup_config,
        )
        from hbsir_old_spark.metadata.settings import PACKAGE_DEFAULTS

        proj = str(tmp_path / "proj")
        path = setup_config(proj)
        # the generated file IS the package defaults
        assert load_settings_file(proj) == PACKAGE_DEFAULTS
        # an edited project file feeds the cascade: project layer wins
        with open(path, "a") as f:
            f.write("\nyears:\n  last: 1390\n")
        engine = HBSIREngine.with_reference_corpus(
            spark, settings=load_settings_file(proj)
        )
        assert engine.last_year == 1390
        assert engine.first_year == PACKAGE_DEFAULTS["years"]["first"]
        # reference semantics: existing file kept unless replace=True
        setup_config(proj)
        assert load_settings_file(proj)["years"]["last"] == 1390
        setup_config(proj, replace=True)
        assert load_settings_file(proj) == PACKAGE_DEFAULTS
        # no project file at all -> empty overrides (defaults apply)
        assert load_settings_file(str(tmp_path / "nowhere")) == {}

    def test_setup_metadata_copies_and_local_override_wins(self, spark, tmp_path):
        import os

        from hbsir_old_spark.api import HBSIREngine, setup_metadata

        proj = str(tmp_path / "proj")
        meta_dir = setup_metadata(proj)
        assert os.path.isfile(os.path.join(meta_dir, "household.yaml"))
        # edit the copied file; the engine pointed at the project metadata
        # dir must honor the edit (the local-override hook end-to-end)
        with open(os.path.join(meta_dir, "household.yaml"), "w") as f:
            f.write(
                "Urban_Rural:\n"
                "  code:\n    position:\n      start: 0\n      end: 1\n"
                "  name:\n    1387:\n      1: \"City\"\n      2: \"Countryside\"\n"
            )
        engine = HBSIREngine.with_reference_corpus(
            spark, local_metadata_dir=meta_dir
        )
        df = spark.createDataFrame([(1400, 10**10 + 5)], "Year int, ID long")
        assert engine.add_attribute(df, "Urban_Rural").collect()[0][
            "Urban_Rural"
        ] == "City"
        # per-file keep-unless-replace (reference setup_metadata semantics)
        setup_metadata(proj)
        assert "City" in open(os.path.join(meta_dir, "household.yaml")).read()
        setup_metadata(proj, replace=True)
        assert "City" not in open(os.path.join(meta_dir, "household.yaml")).read()
