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


# -- real decode path (optional-Pillow guard + built-in minimal PNG) ---------


def _png_encode(pixels, row_filters=None):
    """Pure-stdlib PNG writer for the tests: 8-bit non-interlaced, applies
    the requested per-row filter type (0..4) so every unfilter branch of
    the minimal decoder is exercised."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    h, w, c = arr.shape
    colortype = {1: 0, 3: 2, 4: 6}[c]

    def chunk(ctype, data):
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    filters = row_filters if row_filters is not None else [0] * h
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in enumerate(filters):
        line = flat[y]
        out = line.copy()
        if f == 1:  # Sub
            out[c:] = (line[c:] - line[:-c]) % 256
        elif f == 2:  # Up
            out = (line - prev) % 256
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                out[i] = (int(line[i]) - ((a + int(prev[i])) >> 1)) % 256
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                out[i] = (int(line[i]) - pr) % 256
        raw.append(f)
        raw.extend((out % 256).astype(np.uint8).tobytes())
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def _gradient(h, w, c):
    import numpy as np

    return (
        np.arange(h * w * c, dtype=np.int64).reshape(h, w, c) * 37 % 256
    ).astype(np.uint8)


def test_minimal_png_decoder_roundtrips_every_filter():
    import numpy as np

    from hbsir_old_spark.functions.multimodal import _decode_png_minimal

    pixels = _gradient(5, 4, 3)
    png = _png_encode(pixels, row_filters=[0, 1, 2, 3, 4])
    assert np.array_equal(_decode_png_minimal(png), pixels)
    # greyscale and RGBA shapes too
    grey = _gradient(3, 6, 1)
    assert np.array_equal(_decode_png_minimal(_png_encode(grey, [0, 1, 4])), grey)
    rgba = _gradient(2, 2, 4)
    assert np.array_equal(_decode_png_minimal(_png_encode(rgba)), rgba)


def test_real_decode_png_through_extract_features(spark):
    # the REAL decode path end-to-end through mapInPandas: PNG bytes in,
    # true (width, height, channels) out in the `decoded` struct — no
    # Pillow in this container, so this proves the built-in fallback
    import numpy as np

    from hbsir_old_spark.functions.multimodal import ASSET_SCHEMA

    png = _png_encode(_gradient(5, 4, 3))
    assets = spark.createDataFrame(
        [(1, "image", bytearray(png), None)], schema=ASSET_SCHEMA
    )
    row = extract_features(assets, use_fake_decoder=False).collect()[0]
    assert row["decoded"]["width"] == 4
    assert row["decoded"]["height"] == 5
    assert row["decoded"]["channels"] == 3
    assert row["n_bytes"] == len(png)
    # the fake path leaves decoded NULL (no codec touched)
    fake = extract_features(assets, use_fake_decoder=True).collect()[0]
    assert fake["decoded"] is None


def test_non_png_image_bytes_still_hit_the_guard(spark):
    # without Pillow, non-PNG image bytes must fail loudly through the
    # documented NotImplementedError seam (never silently fake-decode)
    from hbsir_old_spark.functions.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [(1, "image", bytearray(b"GIF89a not a png"), None)], schema=ASSET_SCHEMA
    )
    with pytest.raises(Exception) as err:
        extract_features(assets, use_fake_decoder=False).collect()
    assert "codec" in str(err.value) or "NotImplementedError" in str(err.value)


def test_audio_decode_remains_stubbed(spark):
    from hbsir_old_spark.functions.multimodal import ASSET_SCHEMA

    assets = spark.createDataFrame(
        [(1, "audio", bytearray(b"RIFFfake"), None)], schema=ASSET_SCHEMA
    )
    with pytest.raises(Exception) as err:
        extract_features(assets, use_fake_decoder=False).collect()
    assert "codec" in str(err.value) or "NotImplementedError" in str(err.value)


def test_wide_mode_scaling_never_clips():
    # review-pass regression: convert('RGB') on 16-bit/float modes CLIPS
    # at 255 (a 16-bit scan would decode near-uniform white); the scaler
    # must map the full range instead
    import numpy as np

    from hbsir_old_spark.functions.multimodal import _scale_wide_to_uint8

    sixteen = np.array([[0, 257, 65535]], dtype=np.uint16)
    out = _scale_wide_to_uint8(sixteen, "I;16")
    assert out.tolist() == [[0, 1, 255]]
    # int32 / float: min-max normalized, not clipped
    wide = np.array([[300.0, 30000.0, 65535.0]])
    out = _scale_wide_to_uint8(wide, "F")
    assert out[0][0] == 0 and out[0][2] == 255 and 0 < out[0][1] < 255
    # degenerate constant image -> zeros, no division blow-up
    const = np.full((2, 2), 4242, dtype=np.int32)
    assert _scale_wide_to_uint8(const, "I").max() == 0
