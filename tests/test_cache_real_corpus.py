"""cache_result fingerprinting exercised against the REAL metadata corpus
(reference parity: schema.yaml Total_Expenditure `cache_result: true`,
data_engine.py:48-92): repeat builds must serve the cached parquet without
touching raw survey files, and a change in a DEPENDENCY's resolved dict
(here via the local-metadata override hook) must invalidate the
fingerprint and rebuild.

Original_Expenditures is narrowed to the `food` table through a local
schema override so only one raw fixture is needed; Total_Expenditure and
Expenditures run their genuine schema.yaml specs.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from hbsir_old_spark.api import HBSIREngine  # noqa: E402

LOCAL_BASE = """
Original_Expenditures:
  table_list:
    - food
  instructions:
    - create_column:
        name: Gross_Expenditure
        type: numerical
        expression: Expenditure
    - create_column:
        name: Net_Expenditure
        type: numerical
        expression: Expenditure
"""

# a second override layer that CHANGES Expenditures' resolved dict (the
# annualization factor) — the dependency edit that must invalidate
# Total_Expenditure's fingerprint
LOCAL_CHANGED = LOCAL_BASE + """
Expenditures:
  table_list:
    - Original_Expenditures
  instructions:
    - create_column:
        name: Gross_Expenditure
        type: numerical
        expression: Gross_Expenditure / Duration * 300
    - create_column:
        name: Net_Expenditure
        type: numerical
        expression: Net_Expenditure / Duration * 300
"""


class Counter:
    def __init__(self):
        self.calls = 0


def _make_engine(spark, tmp_path, local_yaml: str, tag: str, cache_dir: str):
    local_dir = tmp_path / f"local_{tag}"
    local_dir.mkdir(exist_ok=True)
    (local_dir / "schema.yaml").write_text(local_yaml)
    counter = Counter()

    def raw_loader(name: str, year: int):
        if name != "food" or year != 1400:
            return None
        counter.calls += 1
        rows = spark.range(1, 201)
        raw = rows.select(
            F.col("id").alias("ADDRESS"),
            (F.lit(11000) + F.col("id") % 7).alias("DYCOL01"),
            (F.lit(1) + F.col("id") % 8).alias("DYCOL02"),
            (F.col("id") % 5 * 100.0).alias("DYCOL03"),
            (F.col("id") % 9 + 1.0).alias("DYCOL04"),
            (F.col("id") * 10.0).alias("DYCOL05"),
            (F.col("id") * 11.0).alias("DYCOL06"),
            F.lit("x").alias("DYCOL07"),
        )
        return raw.select([F.col(c).cast("string").alias(c) for c in raw.columns])

    eng = HBSIREngine.with_reference_corpus(
        spark,
        raw_loader=raw_loader,
        cache_dir=cache_dir,
        local_metadata_dir=str(local_dir),
    )
    return eng, counter


@pytest.fixture(scope="module")
def cache_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("real_corpus_cache"))


def test_total_expenditure_caches_and_hits(spark, tmp_path, cache_dir):
    eng1, c1 = _make_engine(spark, tmp_path, LOCAL_BASE, "a", cache_dir)
    df1 = eng1.load_table("Total_Expenditure", [1400])
    rows1 = {r["ID"]: r["Gross_Expenditure"] for r in df1.collect()}
    assert len(rows1) == 200 and c1.calls >= 1
    cached = os.listdir(cache_dir)
    assert any(
        "Total_Expenditure" in f and f.endswith(".meta.json") for f in cached
    ), cached

    # fresh engine, same metadata: the cached parquet must serve the build
    # without touching the raw survey loader
    eng2, c2 = _make_engine(spark, tmp_path, LOCAL_BASE, "b", cache_dir)
    df2 = eng2.load_table("Total_Expenditure", [1400])
    rows2 = {r["ID"]: r["Gross_Expenditure"] for r in df2.collect()}
    assert rows2 == rows1
    assert c2.calls == 0, "cache hit must not touch raw survey files"


def test_dependency_change_invalidates(spark, tmp_path, cache_dir):
    # prime the cache ourselves so the test stands alone (the dir may or
    # may not already hold an entry from the hit test)
    eng0, _c0 = _make_engine(spark, tmp_path, LOCAL_BASE, "c0", cache_dir)
    eng0.load_table("Total_Expenditure", [1400]).count()
    eng1, c1 = _make_engine(spark, tmp_path, LOCAL_BASE, "c", cache_dir)
    base = {r["ID"]: r["Gross_Expenditure"] for r in eng1.load_table(
        "Total_Expenditure", [1400]).collect()}
    assert c1.calls == 0  # primed above

    eng3, c3 = _make_engine(spark, tmp_path, LOCAL_CHANGED, "d", cache_dir)
    df3 = eng3.load_table("Total_Expenditure", [1400])
    rows3 = {r["ID"]: r["Gross_Expenditure"] for r in df3.collect()}
    assert c3.calls >= 1, "changed dependency dict must invalidate the cache"
    # x300 vs x360 annualization: every non-null value shrinks by 5/6
    some_id = next(iter(base))
    assert rows3[some_id] == pytest.approx(base[some_id] * 300 / 360)

    # and the changed variant now caches under ITS fingerprint: a repeat
    # build with the same override hits cleanly again
    eng4, c4 = _make_engine(spark, tmp_path, LOCAL_CHANGED, "e", cache_dir)
    rows4 = {r["ID"]: r["Gross_Expenditure"] for r in eng4.load_table(
        "Total_Expenditure", [1400]).collect()}
    assert rows4 == rows3 and c4.calls == 0
