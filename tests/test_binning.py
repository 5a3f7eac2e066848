"""bin_by_breaks (P24): labeled interval binning vs the pandas.cut oracle.

The reference's income-bracket results example
(/root/reference/examples/ISC/results/urban/1400/results.ipynb cell 3) is
pd.cut with ±inf-bounded breaks; the helper must reproduce pandas' edge
semantics exactly — right-closed intervals, breaks binning to the lower
bracket, NaN/out-of-range to NULL.
"""

import math
import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.standard import bin_by_breaks  # noqa: E402

BREAKS = [-math.inf, 10.0, 20.0, 30.0, math.inf]
LABELS = ["< 10", "10 - 20", "20 - 30", "30 <"]
# every edge: breaks themselves, interior points, ±inf values, NULL
VALUES = [
    -math.inf, -5.0, 0.0, 10.0, 10.0000001, 15.0, 20.0, 25.0, 30.0,
    31.0, 1e12, math.inf, None,
]


def _spark_bins(spark, right: bool) -> list:
    df = spark.createDataFrame([(v,) for v in VALUES], "v double")
    rows = (
        df.select("v", bin_by_breaks("v", BREAKS, LABELS, right=right).alias("b"))
        .collect()
    )
    out = {}
    for r in rows:
        out["null" if r["v"] is None else repr(r["v"])] = r["b"]
    return [out["null" if v is None else repr(v)] for v in VALUES]


@pytest.mark.parametrize("right", [True, False])
def test_matches_pandas_cut(spark, right):
    got = _spark_bins(spark, right)
    expected_raw = pd.cut(
        pd.Series(VALUES, dtype="float64"), BREAKS, labels=LABELS, right=right
    )
    expected = [None if x is np.nan or pd.isna(x) else str(x) for x in expected_raw]
    assert got == expected


def test_break_values_bin_to_lower_bracket(spark):
    # right=True: v == 10.0 belongs to "< 10" ((-inf, 10]), never "10 - 20"
    got = dict(zip(VALUES, _spark_bins(spark, True)))
    assert got[10.0] == "< 10"
    assert got[20.0] == "10 - 20"
    assert got[-math.inf] is None  # open left edge of (-inf, 10]
    assert got[math.inf] == "30 <"  # closed right edge of (30, inf]
    assert got[None] is None


@pytest.mark.parametrize("right", [True, False])
def test_finite_outer_bounds_match_pandas_cut(spark, right):
    # finite breaks: values outside [first, last] must bin to NULL (pandas
    # NaN), including the exact outer-edge exclusions per `right`
    breaks = [10.0, 20.0, 30.0]
    labels = ["a", "b"]
    values = [5.0, 10.0, 10.5, 20.0, 29.999, 30.0, 31.0, None]
    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = {
        ("null" if r["v"] is None else r["v"]): r["b"]
        for r in df.select(
            "v", bin_by_breaks("v", breaks, labels, right=right).alias("b")
        ).collect()
    }
    expected_raw = pd.cut(
        pd.Series(values, dtype="float64"), breaks, labels=labels, right=right
    )
    for v, exp in zip(values, expected_raw):
        key = "null" if v is None else v
        exp = None if pd.isna(exp) else str(exp)
        assert got[key] == exp, (v, got[key], exp)


def test_validation():
    with pytest.raises(ValueError, match="at least 2 breaks"):
        bin_by_breaks("v", [50000.0], [])
    with pytest.raises(ValueError, match="len\\(breaks\\)-1"):
        bin_by_breaks("v", [0, 1, 2], ["only-one-label", "x", "y"])
    with pytest.raises(ValueError, match="strictly increasing"):
        bin_by_breaks("v", [0, 2, 1], ["a", "b"])
    with pytest.raises(ValueError, match="strictly increasing"):
        bin_by_breaks("v", [0, 1, 1], ["a", "b"])


def test_many_random_configs_match_pandas_cut(spark):
    # 12 deterministic random break configurations (finite and ±inf outer
    # bounds, 2-8 intervals, both polarities) evaluated in ONE Spark job:
    # each config is one binning column over the same value set, compared
    # elementwise against pandas.cut
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260815)
    configs = []
    for i in range(12):
        k = rng.randint(2, 8)
        cuts = sorted(rng.sample(range(-100, 100), k + 1))
        breaks = [float(c) for c in cuts]
        if i % 3 == 0:
            breaks[0], breaks[-1] = -math.inf, math.inf
        labels = [f"c{i}_{j}" for j in range(k)]
        configs.append((breaks, labels, i % 2 == 0))

    values = [None] + [float(v) for v in range(-105, 106, 3)]
    # every break value itself is an edge case: include them all
    for breaks, _, _ in configs:
        values.extend(b for b in breaks if math.isfinite(b))
    values = list(dict.fromkeys(values))

    df = spark.createDataFrame([(v,) for v in values], "v double")
    cols = [
        bin_by_breaks("v", breaks, labels, right=right).alias(f"b{i}")
        for i, (breaks, labels, right) in enumerate(configs)
    ]
    rows = df.select("v", *cols).collect()
    got = {("null" if r["v"] is None else r["v"]): r for r in rows}

    series = pd.Series(values, dtype="float64")
    for i, (breaks, labels, right) in enumerate(configs):
        expected = pd.cut(series, breaks, labels=labels, right=right)
        for v, exp in zip(values, expected):
            key = "null" if v is None else v
            exp = None if pd.isna(exp) else str(exp)
            assert got[key][f"b{i}"] == exp, (i, v, got[key][f"b{i}"], exp)


def test_binning_is_map_only(spark):
    df = spark.range(100).select(F.col("id").cast("double").alias("v"))
    out = df.select(bin_by_breaks("v", BREAKS, LABELS).alias("b"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
