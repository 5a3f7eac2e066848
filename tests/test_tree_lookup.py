"""_tree_lookup_sql (r14): the balanced dispatch tree for large
classification chains must be bit-identical to the flat chain, and must
refuse (fall back) exactly where flat-chain order semantics could differ."""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.operators.classification import (  # noqa: E402
    _expression_lookup,
    _expression_lookup_fold,
    _tree_lookup_sql,
    _TREE_MIN_ROWS,
)


def _random_dim(rng, years, per_year, aspect="lab"):
    rows = []
    for y in years:
        bounds = sorted(rng.sample(range(100, 100_000), per_year + 1))
        for i in range(per_year):
            rows.append(
                {
                    "year": y,
                    "code_start": bounds[i],
                    "code_end": bounds[i + 1],
                    aspect: None if i % 17 == 0 else f"cat{i % 9}",
                }
            )
    rng.shuffle(rows)  # compile order must not matter for disjoint rows
    return rows


def _probe_frame(spark, rng, years):
    # boundary-heavy probe: starts, ends, gaps, NULL code, NULL year,
    # unlisted year
    rows = []
    for i in range(2000):
        rows.append((rng.randrange(50, 110_000), rng.choice(years + [1300])))
    rows += [(None, years[0]), (500, None), (None, None)]
    return spark.createDataFrame(rows, "Code long, Year long")


def test_tree_fires_and_matches_fold_on_multi_year_dim(spark):
    rng = random.Random(11)
    years = [1390, 1391, 1392, 1393]
    rows = _random_dim(rng, years, 12)  # 48 rows >= _TREE_MIN_ROWS
    assert len(rows) >= _TREE_MIN_ROWS
    assert _tree_lookup_sql(rows, "Code", "Year", "lab", "string", False) is not None
    df = _probe_frame(spark, rng, years)
    tree_col = _expression_lookup(rows, "Code", "Year", "lab")
    fold_col = _expression_lookup_fold(rows, "Code", "Year", "lab")
    got = df.select(
        "Code", "Year", tree_col.alias("t"), fold_col.alias("f")
    ).collect()
    for r in got:
        assert r["t"] == r["f"], (r["Code"], r["Year"], r["t"], r["f"])


def test_tree_fires_and_matches_fold_on_yearless_dim(spark):
    rng = random.Random(12)
    rows = [dict(r, year=None) for r in _random_dim(rng, [0], 40)]
    assert _tree_lookup_sql(rows, "Code", None, "lab", "string", False) is not None
    df = _probe_frame(spark, rng, [1390])
    tree_col = _expression_lookup(rows, "Code", None, "lab")
    fold_col = _expression_lookup_fold(rows, "Code", None, "lab")
    for r in df.select(tree_col.alias("t"), fold_col.alias("f")).collect():
        assert r["t"] == r["f"]


def test_tree_refuses_unsafe_shapes(spark):
    rng = random.Random(13)
    rows = _random_dim(rng, [1390, 1391], 20)
    # mixed year/year-free rows interleave priority -> flat chain only
    mixed = rows + [dict(rows[0], year=None)]
    assert _tree_lookup_sql(mixed, "Code", "Year", "lab", "string", False) is None
    # overlapping rows (override layers) depend on compile order
    overlap = rows + [dict(rows[0], lab="override")]
    assert _tree_lookup_sql(overlap, "Code", "Year", "lab", "string", False) is None
    # below the size floor the flat chain is kept
    small = rows[: _TREE_MIN_ROWS - 1]
    assert _tree_lookup_sql(small, "Code", "Year", "lab", "string", False) is None
    # but all-year-free dims above the floor do fire
    yearless = [dict(r, year=None) for r in _random_dim(rng, [0], 40)]
    assert (
        _tree_lookup_sql(yearless, "Code", "Year", "lab", "string", False)
        is not None
    )
