"""Partitioned parquet round-trip + partition-pruning plan checks."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_fixtures import write_fixture_parquet  # noqa: E402
from hbsir_old_spark.api import HBSIREngine, parquet_base_loader  # noqa: E402
from hbsir_old_spark.sources.writer import read_partitioned, write_partitioned  # noqa: E402


def test_partitioned_roundtrip_and_pruning(spark, tmp_path):
    root = str(tmp_path / "fixtures")
    write_fixture_parquet(root)
    engine = HBSIREngine(spark, base_loader=parquet_base_loader(spark, root))
    table = engine.load_table("food", [1375, 1394, 1400])

    out = str(tmp_path / "food_partitioned")
    write_partitioned(table, out, partition_cols=("Year",))
    assert sorted(d for d in os.listdir(out) if d.startswith("Year=")) == [
        "Year=1375", "Year=1394", "Year=1400",
    ]

    back = read_partitioned(spark, out)
    assert back.count() == table.count()

    filtered = back.filter(F.col("Year") == 1400)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "Year" in plan.split("PartitionFilters")[1][:120]
    # pruned scan reads only the one directory
    assert filtered.count() == table.filter(F.col("Year") == 1400).count()


def test_partitioned_base_loader_drives_registry(spark, tmp_path):
    from hbsir_old_spark.api import partitioned_base_loader

    flat_root = str(tmp_path / "flat")
    write_fixture_parquet(flat_root)
    flat_engine = HBSIREngine(spark, base_loader=parquet_base_loader(spark, flat_root))

    part_root = str(tmp_path / "partitioned")
    for table in ("food", "durable", "household_information", "members_properties",
                  "other_income", "weights"):
        try:
            df = flat_engine.load_table(table, [1375, 1394, 1400])
        except ValueError:
            continue
        write_partitioned(df, os.path.join(part_root, table), partition_cols=("Year",))

    part_engine = HBSIREngine(spark, base_loader=partitioned_base_loader(spark, part_root))
    flat_total = flat_engine.load_table("Total_Expenditure", [1394, 1400])
    part_total = part_engine.load_table("Total_Expenditure", [1394, 1400])
    l = flat_total.orderBy("Year", "ID").collect()
    r = part_total.orderBy("Year", "ID").collect()
    assert [tuple(x) for x in l] == [tuple(x) for x in r]

    # pruning reaches the scan through the whole derived-table plan
    plan = part_engine.load_table("food", [1400])._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "Year" in plan.split("PartitionFilters")[1][:120]


def test_l15b_era_scans_prune(spark):
    """The 39-year full-span food build over the Year-partitioned layout
    (gate l15b) must serve each metadata era as ONE pruned scan: every
    FileScan carries a PartitionFilters entry on Year, and the scan count
    stays at the era-group count (~8), nowhere near one-per-year (39)."""
    import __spark_entry__ as e

    df = e.q_partitioned_span_food(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = plan.count("FileScan parquet")
    assert 1 <= scans <= 12, f"expected ~one scan per era group, got {scans}"
    assert plan.count("PartitionFilters: [") == scans
    # every scan's partition filter constrains Year
    for chunk in plan.split("PartitionFilters: [")[1:]:
        assert "Year" in chunk[:200], chunk[:200]
    # a narrower span prunes to fewer era scans
    from hbsir_old_spark.metadata.corpus import build_reference_registry

    reg = build_reference_registry(
        spark, raw_loader=e._l15b_raw_loader(spark, "/root/testdata/sf0.001")
    )
    one_era = reg.load_table("food", [1400, 1401], form="processed")
    plan_1 = one_era._jdf.queryExecution().executedPlan().toString()
    assert plan_1.count("FileScan parquet") <= 3


def test_years_from_input_files_partitioned(spark, tmp_path):
    """infer_years on a Year-partitioned layout is metadata-only: path
    parsing yields the year list and the distinct-scan fallback never
    runs (pinned by poisoning select)."""
    from hbsir_old_spark.sources.partitions import infer_years, years_from_input_files

    df = spark.createDataFrame(
        [(1375, 1, 10.0), (1394, 2, 20.0), (1400, 3, 30.0)], ["Year", "ID", "V"]
    )
    out = str(tmp_path / "span")
    df.write.partitionBy("Year").parquet(out)
    back = spark.read.parquet(out)

    assert years_from_input_files(back) == [1375, 1394, 1400]

    class _NoScan:
        def __init__(self, inner):
            self._inner = inner

        def inputFiles(self):
            return self._inner.inputFiles()

        def select(self, *a, **k):  # pragma: no cover - fails the test
            raise AssertionError("distinct-scan fallback ran on a partitioned layout")

    assert infer_years(_NoScan(back)) == [1375, 1394, 1400]

    # filters don't break the path (documented superset contract)
    assert years_from_input_files(back.filter("Year = 1394")) == [1375, 1394, 1400]


def test_years_from_input_files_fallbacks(spark, tmp_path):
    """Non-partitioned layouts and in-memory frames fall back to the
    exact distinct scan."""
    from hbsir_old_spark.sources.partitions import infer_years, years_from_input_files

    df = spark.createDataFrame([(1375, 1), (1394, 2)], ["Year", "ID"])
    assert years_from_input_files(df) is None  # no input files
    assert infer_years(df) == [1375, 1394]

    flat = str(tmp_path / "flat")
    df.write.parquet(flat)
    back = spark.read.parquet(flat)
    assert years_from_input_files(back) is None  # no Year= segment
    assert infer_years(back) == [1375, 1394]
