"""lsh_band_plan: the MinHash-LSH band/row auto-tuner (minimum weighted
FP+FN area of the banding S-curve). Pure-python properties — exact split,
threshold monotonicity, weight asymmetry, proximity of the chosen curve's
inflection to the requested threshold — plus one Spark smoke proving
``minhash_lsh_pairs(bands=None)`` wires through."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hbsir_old_spark.functions.dedup import (  # noqa: E402
    lsh_band_plan,
    minhash_lsh_pairs,
)


def test_exact_split_always():
    for num_perm in (1, 2, 12, 16, 60, 64, 128, 100):
        for t in (0.1, 0.3, 0.5, 0.7, 0.9):
            b, r = lsh_band_plan(t, num_perm)
            assert b * r == num_perm
            assert b >= 1 and r >= 1


def test_bands_monotone_in_threshold():
    # a higher similarity bar wants a steeper, later S-curve: rows per
    # band grow, bands shrink (non-strictly — divisor grid is coarse)
    prev_bands = None
    for t in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        b, _ = lsh_band_plan(t, 64)
        if prev_bands is not None:
            assert b <= prev_bands, (t, b, prev_bands)
        prev_bands = b


def test_curve_inflection_near_threshold():
    # the chosen curve's admission midpoint (1/b)^(1/r) should land near
    # the requested threshold; 128 = 2^7 gives a coarse divisor grid, so
    # allow the half-gap of that grid
    for t in (0.15, 0.3, 0.5, 0.7, 0.85):
        b, r = lsh_band_plan(t, 128)
        mid = (1.0 / b) ** (1.0 / r)
        assert abs(mid - t) < 0.25, (t, b, r, mid)


def test_weight_asymmetry():
    # caring only about false positives -> steeper curve (more rows per
    # band, fewer bands); only about false negatives -> the opposite
    b_fp, _ = lsh_band_plan(0.5, 64, fp_weight=1.0, fn_weight=0.0)
    b_bal, _ = lsh_band_plan(0.5, 64)
    b_fn, _ = lsh_band_plan(0.5, 64, fp_weight=0.0, fn_weight=1.0)
    assert b_fp <= b_bal <= b_fn
    assert b_fp < b_fn


def test_known_plan_16_perm():
    # 16 permutations at the x3 gate's threshold 0.2: the planner must
    # pick a mid-grid split, never the degenerate 16x1 / 1x16 extremes
    b, r = lsh_band_plan(0.2, 16)
    assert (b, r) not in ((16, 1), (1, 16))
    assert b * r == 16


def test_validation():
    with pytest.raises(ValueError):
        lsh_band_plan(0.0, 16)
    with pytest.raises(ValueError):
        lsh_band_plan(1.0, 16)
    with pytest.raises(ValueError):
        lsh_band_plan(0.5, 0)


def test_minhash_auto_bands_smoke(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again!"),
        (3, "completely different text with no shared shingles at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    auto = minhash_lsh_pairs(df, bands=None, threshold=0.2)
    planned_bands, _ = lsh_band_plan(0.2, 16)
    explicit = minhash_lsh_pairs(df, bands=planned_bands, threshold=0.2)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    pair_ids = {(r[0], r[1]) for r in auto.select("id_a", "id_b").collect()}
    assert (1, 2) in pair_ids or (2, 1) in pair_ids
