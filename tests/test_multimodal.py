"""Multimodal-column plumbing tests: schema, Arrow batch flow, deterministic
fake features, the stubbed real-decoder gate, and frame sampling."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hbsir_old_spark.functions.multimodal import (  # noqa: E402
    FEATURE_DIM,
    extract_features,
    frame_sample,
    synthetic_assets,
)


@pytest.fixture(scope="module")
def assets(spark):
    return synthetic_assets(spark, n=48)


def test_extract_features_schema_and_determinism(spark, assets):
    feats = extract_features(assets, use_fake_decoder=True)
    rows = {r["asset_id"]: r for r in feats.collect()}
    assert len(rows) == 48
    for r in rows.values():
        assert len(r["features"]) == FEATURE_DIM
        assert len(r["content_sha"]) == 64
        assert r["n_bytes"] > 0
    # deterministic: run twice, same shas and features
    again = {r["asset_id"]: r for r in extract_features(assets, True).collect()}
    assert all(rows[k]["content_sha"] == again[k]["content_sha"] for k in rows)
    assert all(rows[k]["features"] == again[k]["features"] for k in rows)


def test_features_unit_norm(assets):
    feats = extract_features(assets, use_fake_decoder=True)
    norms = feats.select(
        F.sqrt(F.aggregate("features", F.lit(0.0), lambda a, v: a + v * v)).alias("n")
    )
    for r in norms.collect():
        assert abs(r["n"] - 1.0) < 1e-5


def test_real_decoder_is_stubbed(assets):
    feats = extract_features(assets, use_fake_decoder=False)
    with pytest.raises(Exception) as err:
        feats.collect()
    assert "NotImplementedError" in str(err.value) or "codecs" in str(err.value)


def test_frame_sampling_schedule(assets):
    frames = frame_sample(assets, every_n=10)
    pdf = frames.toPandas()
    assert (pdf.groupby("asset_id").frame_no.min() == 0).all()
    assert set(pdf.frame_no % 10) == {0}
