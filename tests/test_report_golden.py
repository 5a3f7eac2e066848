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
