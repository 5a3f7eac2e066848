"""Property test: weighted_ecdf reproduces the reference's pandas
formulation exactly — sort by value, cumsum(weight)/sum(weight) per group
(/root/reference/hbsir/calculator/quantile.py:119-146) — with ties pinned by
the id tiebreaker."""

import os
import sys

import pandas as pd
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.operators.quantile import weighted_ecdf  # noqa: E402


@st.composite
def weighted_tables(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    groups = draw(st.lists(st.integers(0, 2), min_size=n, max_size=n))
    # limited value pool forces ties; weights are positive half-integers
    values = draw(st.lists(st.integers(0, 5), min_size=n, max_size=n))
    weights = draw(st.lists(st.integers(1, 8), min_size=n, max_size=n))
    return pd.DataFrame(
        {
            "g": groups,
            "id": range(n),
            "v": [float(v) for v in values],
            "w": [w / 2 for w in weights],
        }
    )


@given(weighted_tables())
@settings(max_examples=12, deadline=None)
def test_matches_pandas_cumsum_formulation(spark, pdf):
    sdf = spark.createDataFrame(pdf)
    got = (
        weighted_ecdf(sdf, "v", "w", group_cols=("g",), tiebreaker_cols=("id",))
        .toPandas()
        .set_index("id")["Quantile"]
        .sort_index()
    )
    expected = (
        pdf.sort_values(["g", "v", "id"])
        .assign(
            q=lambda t: t.groupby("g")["w"].cumsum()
            / t.groupby("g")["w"].transform("sum")
        )
        .set_index("id")["q"]
        .sort_index()
    )
    assert ((got - expected).abs() < 1e-12).all()
