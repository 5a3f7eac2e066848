"""Presentation-shape golden for the reference's README walkthrough
(reference tests/test_package/package/test_by_examples.py:43-69): the pivot
must carry exactly the category rows plus a "Total" row that is the
column-wise sum of the category rows (union-of-totals, pandas
``table.loc["Total"] = table.sum()``)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    rows = entry_mod.q_report_pivot_totals(spark, sf_dir).collect()
    return {r["Category"]: r for r in rows}


def test_rows_are_categories_plus_total(report):
    assert set(report) == {"Food", "NonFood", "Total"}


def test_columns_are_urban_rural_by_metric(report):
    assert set(report["Total"].asDict()) == {
        "Category", "Urban_Net", "Urban_Gross", "Rural_Net", "Rural_Gross",
    }


def test_total_row_is_columnwise_sum(report):
    for col in ("Urban_Net", "Urban_Gross", "Rural_Net", "Rural_Gross"):
        total = report["Total"][col]
        parts = report["Food"][col] + report["NonFood"][col]
        assert total == pytest.approx(parts, abs=2e-4)  # both sides round 4dp


def test_net_never_exceeds_gross(report):
    # net = gross * (1 - discount) with discount >= 0, preserved through
    # every weighted aggregation step
    for cat in ("Food", "NonFood", "Total"):
        assert report[cat]["Urban_Net"] <= report[cat]["Urban_Gross"]
        assert report[cat]["Rural_Net"] <= report[cat]["Rural_Gross"]


def test_truncation_contract_matches_reference_golden(spark):
    """The reference's golden test compares cells as INTEGERS obtained by
    truncation — ``(value / 1000 / 10_000).astype(int)`` — computed AFTER
    the Total row is summed from untruncated cells
    (test_by_examples.py:52-69). Hand-computed fixture: several cells sit
    just below an integer boundary (24.99999, 2.9999999, 6.6), so a
    round-half-up implementation, or one that truncates before totalling,
    fails."""
    import pyspark.sql.functions as F  # noqa: F401

    hh = spark.createDataFrame(
        [
            # (Year, ID, Food_NonFood, Gross, Net, Weight, Urban_Rural)
            (1400, 1, "Food", 1_285_000_000.0, 1_249_999_500.0, 2.0, "Urban"),
            (1400, 2, "NonFood", 110_000_000.0, 100_000_000.0, 6.0, "Urban"),
            (1400, 3, "Food", 29_999_999.0, 20_000_000.0, 5.0, "Rural"),
            (1400, 3, "NonFood", 32_000_000.0, 31_000_000.0, 5.0, "Rural"),
        ],
        "Year int, ID long, Food_NonFood string, Gross double, Net double, "
        "Weight double, Urban_Rural string",
    )
    roster = spark.createDataFrame(
        [("Urban", 4.0), ("Urban", 6.0), ("Rural", 5.0)],
        "Urban_Rural string, Weight double",
    )
    report = {
        r["Category"]: r
        for r in entry_mod._report_pivot_tail(
            entry_mod._isc_cells(hh, roster)
        ).collect()
    }
    expected = {
        ("Food", "Urban", "Net"): 24,      # 24.99999 truncates DOWN
        ("Food", "Urban", "Gross"): 25,    # 25.7
        ("NonFood", "Urban", "Net"): 6,    # 6.0
        ("NonFood", "Urban", "Gross"): 6,  # 6.6 truncates DOWN
        ("Total", "Urban", "Net"): 30,     # 30.99999 (pre-truncation sum)
        ("Total", "Urban", "Gross"): 32,   # 32.3 != 25 + 6: totals sum
                                           # BEFORE truncation
        ("Food", "Rural", "Net"): 2,       # 2.0
        ("Food", "Rural", "Gross"): 2,     # 2.9999999 truncates DOWN
        ("NonFood", "Rural", "Net"): 3,    # 3.1
        ("NonFood", "Rural", "Gross"): 3,  # 3.2
        ("Total", "Rural", "Net"): 5,      # 5.1
        ("Total", "Rural", "Gross"): 6,    # 6.1999999
    }
    got = {
        (cat, ur, metric): int(report[cat][f"{ur}_{metric}"] / 10_000)
        for cat in ("Food", "NonFood", "Total")
        for ur in ("Urban", "Rural")
        for metric in ("Net", "Gross")
    }
    assert got == expected
