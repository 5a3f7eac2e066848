"""Regression tests for the round-1 code-review findings — each test pins a
bug that execution or analysis confirmed."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_fixtures import write_fixture_parquet  # noqa: E402
from hbsir_old_spark.api import HBSIREngine, parquet_base_loader  # noqa: E402
from hbsir_old_spark.functions.dedup import minhash_lsh_pairs, simhash  # noqa: E402
from hbsir_old_spark.operators.classification import (  # noqa: E402
    add_classification,
    build_classification_dim,
)
from hbsir_old_spark.operators.scale import salted_join  # noqa: E402
from hbsir_old_spark.sources.acquire import extract_archive  # noqa: E402


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fixtures_rf"))
    write_fixture_parquet(root)
    return HBSIREngine(spark, base_loader=parquet_base_loader(spark, root))


def test_outlays_build_for_pre_1380_years(engine):
    # pre-1380 the table_list is food-only (no Secondhand_Sale column);
    # the year-versioned expression must not reference it
    df = engine.load_table("Total_Outlay", [1375])
    rows = df.collect()
    assert len(rows) > 0
    multi = engine.load_table("Total_Outlay", [1375, 1400])
    assert multi.select("Year").distinct().count() == 2


def test_join_strategy_year_agnostic_dim_matches_expression(spark, sf_dir):
    # year=null dim rows apply to every year — both strategies must agree
    items = {
        f"b{i}": {"code": {"start": i * 100, "end": i * 100 + 100}, "level": 1}
        for i in range(21)
    }
    dim = build_classification_dim({"items": items}, years=None)
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumn("Year", F.lit(1400))
    via_expr = add_classification(
        li, dim, code_col="l_partkey", levels=(1,), strategy="expression"
    )
    via_join = add_classification(
        li, dim, code_col="l_partkey", levels=(1,), strategy="join"
    )
    e = via_expr.groupBy("item_key").count().orderBy("item_key").collect()
    j = via_join.groupBy("item_key").count().orderBy("item_key").collect()
    assert [tuple(r) for r in e] == [tuple(r) for r in j]
    assert any(r["item_key"] is not None for r in j)


def test_simhash_64_bit(spark):
    df = spark.createDataFrame([("hello world foo bar",)], schema="text string")
    value = df.select(simhash("text", bits=64).alias("h")).collect()[0]["h"]
    assert isinstance(value, int)


def test_minhash_band_divisibility_validated(spark):
    df = spark.createDataFrame([(1, "a b c")], schema="doc_id long, text string")
    with pytest.raises(ValueError, match="evenly divide"):
        minhash_lsh_pairs(df, num_perm=16, bands=5)


def test_salted_join_rejects_right_outer(spark):
    df = spark.createDataFrame([(1, 2)], schema="k int, v int")
    with pytest.raises(ValueError, match="salt replica"):
        salted_join(df, df, "k", how="right")


def test_nested_archive_extraction_no_duplicates(tmp_path):
    import zipfile

    inner = tmp_path / "inner.zip"
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("data.csv", "x\n1\n")
    outer = tmp_path / "outer.zip"
    with zipfile.ZipFile(outer, "w") as zf:
        zf.write(inner, "inner.zip")
    out = extract_archive(str(outer), str(tmp_path / "o"))
    csvs = [p for p in out if p.endswith("data.csv")]
    assert len(csvs) == 1, f"duplicate extraction: {csvs}"


def test_weights_join_has_no_forced_broadcast(engine):
    te = engine.load_table("Total_Expenditure", [1400])
    plan = engine.add_weight(te)._jdf.queryExecution().logical().toString()
    assert "broadcast" not in plan.lower()
