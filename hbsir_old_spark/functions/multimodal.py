"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

Image decode is REAL behind an optional-dependency guard: Pillow when
installed, else a built-in minimal pure-stdlib PNG decoder (so the real
path stays exercisable end-to-end in codec-less containers); audio decode
remains a stub raising NotImplementedError (install soundfile/torchaudio
and fill in ``_real_decode_audio``). Everything Spark-side is real and
tested — schemas, batch iteration, partitioning, UDF signatures.

Scale notes: media bytes ride in parquet binary columns; mapInPandas streams
Arrow record batches so a 100 TB corpus is processed one batch at a time per
task with no row-at-a-time serde. Keep
``spark.sql.execution.arrow.maxRecordsPerBatch`` modest (e.g. 256) when rows
carry megabyte blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical schema for a multimodal asset table
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        # real decode results (width/height/channels) when the REAL
        # decode path ran; NULL on the fake path and for kinds whose
        # codec is still stubbed
        T.StructField(
            "decoded",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_minimal(content: bytes) -> np.ndarray:
    """Minimal pure-stdlib PNG decoder (the public PNG spec / RFC 2083):
    8-bit non-interlaced greyscale/RGB/RGBA, all five scanline filters
    (None/Sub/Up/Average/Paeth). Exists so the REAL decode path is
    exercisable end-to-end in codec-less environments — per-pixel Python
    unfiltering is fine for small fixtures, and production environments
    install Pillow, which takes precedence in :func:`_real_decode_image`.
    Returns an HxWxC uint8 array."""
    import struct
    import zlib

    if not content or not content.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG byte stream")
    pos = len(_PNG_MAGIC)
    width = height = colortype = None
    idat = b""
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bitdepth != 8 or interlace != 0 or colortype not in (0, 2, 6):
                raise NotImplementedError(
                    "minimal PNG decoder handles 8-bit non-interlaced "
                    "greyscale/RGB/RGBA only; install pillow for the rest"
                )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR chunk")
    channels = {0: 1, 2: 3, 6: 4}[colortype]
    raw = zlib.decompress(idat)
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    bpp = channels
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    p = 0
    for y in range(height):
        f = raw[p]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=p + 1).copy()
        p += stride + 1
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (int(line[i]) + int(line[i - bpp])) & 0xFF
        elif f == 2:  # Up
            line = ((line.astype(np.int32) + prev) & 0xFF).astype(np.uint8)
        elif f == 3:  # Average
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                line[i] = (int(line[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (int(line[i]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = line
        prev = line
    return out.reshape(height, width, channels)


def _scale_wide_to_uint8(wide: np.ndarray, mode: str) -> np.ndarray:
    """Scale a 16-bit/int32/float pixel array to uint8 — never clip.
    16-bit modes map 0..65535 onto 0..255 (divide by 257, full-range
    preserving); int32/float have no defined range, so they min-max
    normalize per image (deterministic; documented heuristic). Pure
    numpy so the math is testable without Pillow installed."""
    wide = wide.astype(np.float64)
    if mode.startswith("I;16"):
        wide = wide / 257.0
    else:
        lo = float(wide.min()) if wide.size else 0.0
        hi = float(wide.max()) if wide.size else 0.0
        wide = (wide - lo) * (255.0 / (hi - lo)) if hi > lo else wide * 0.0
    return np.clip(np.round(wide), 0, 255).astype(np.uint8)


def _real_decode_image(content: bytes) -> np.ndarray:
    """Real image decode (bytes -> HxWxC uint8 array) behind the optional-
    dependency guard: Pillow when installed (any format it reads);
    otherwise the built-in minimal PNG decoder for PNG bytes; otherwise
    the documented NotImplementedError seam."""
    try:
        from PIL import Image  # optional; absent in this container
    except ImportError:
        if content and content.startswith(_PNG_MAGIC):
            return _decode_png_minimal(content)
        raise NotImplementedError(
            "no image codec available for these bytes: install pillow "
            "(any format), or supply PNG bytes for the built-in minimal "
            "decoder"
        )
    import io

    img = Image.open(io.BytesIO(content))
    # normalize to the contract (8-bit HxWxC): palette images would
    # otherwise surface raw palette INDICES as channels=1; grey+alpha
    # keeps its alpha (LA/PA -> RGBA, not RGB — convert('RGB') would
    # silently drop the band); 16-bit/int/float modes are SCALED to
    # uint8, never convert('RGB')-ed, which clips at 255 and destroys
    # high-bit-depth data (review-pass finding)
    if img.mode == "P":
        img = img.convert("RGBA" if "transparency" in img.info else "RGB")
    elif img.mode in ("LA", "PA"):
        img = img.convert("RGBA")
    elif img.mode in ("I", "I;16", "I;16B", "I;16L", "I;16N", "F"):
        arr = _scale_wide_to_uint8(np.asarray(img), img.mode)
        return arr if arr.ndim == 3 else arr[:, :, None]
    elif img.mode not in ("L", "RGB", "RGBA"):
        img = img.convert("RGB")
    arr = np.asarray(img)
    return arr if arr.ndim == 3 else arr[:, :, None]


def _real_decode_audio(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio codecs are not available in this container; "
        "install soundfile/torchaudio and decode here (bytes -> samples)"
    )


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature extractor: sha256 -> unit-norm floats.
    Keeps the whole pipeline runnable and testable without codecs."""
    digest = hashlib.sha256(content or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<u4")
    vec = (raw.astype(np.float64) / np.iinfo("u4").max) - 0.5
    n = np.linalg.norm(vec)
    return (vec / n if n else vec).astype(np.float32)


def extract_features(assets: DataFrame, use_fake_decoder: bool = True) -> DataFrame:
    """Decode + featurize every asset via mapInPandas (Arrow batches).

    With ``use_fake_decoder=False`` images run the REAL decode path
    (:func:`_real_decode_image`: Pillow when installed, the built-in
    minimal PNG decoder otherwise) and the ``decoded`` struct carries the
    true (width, height, channels); audio still raises
    NotImplementedError — the remaining documented extension point. The
    fake path leaves ``decoded`` NULL and touches no codec.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded: list[dict | None] = []
            if use_fake_decoder:
                decoded = [None] * len(pdf)
            else:
                for kind, content in zip(pdf["kind"], pdf["content"]):
                    if kind == "audio":
                        _real_decode_audio(content)
                        decoded.append(None)
                    else:
                        arr = _real_decode_image(content)
                        decoded.append(
                            {
                                "width": int(arr.shape[1]),
                                "height": int(arr.shape[0]),
                                "channels": int(arr.shape[2]),
                            }
                        )
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": pdf["content"].map(lambda b: _fake_features(b).tolist()),
                    "decoded": decoded,
                }
            )
            yield out

    return assets.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling *plumbing*: emits (asset_id, frame_no) rows for
    every ``every_n``-th frame according to metadata — the real decoder
    would attach pixels; here the schedule itself is the tested surface."""
    return (
        assets.filter(F.col("kind") == "video")
        .select(
            "asset_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("meta.n_frames") - 1, F.lit(0)), F.lit(every_n))
            ).alias("frame_no"),
        )
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic fake asset table for tests (no codecs involved)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        content = hashlib.sha256(str(i).encode()).digest() * (i % 5 + 1)
        meta = {
            "width": 64 + i if kind == "image" else None,
            "height": 48 + i if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 30 * (i % 7 + 1) if kind == "video" else None,
            "mime": f"{kind}/x-fake",
        }
        rows.append((i, kind, bytearray(content), meta))
    return spark.createDataFrame(rows, schema=ASSET_SCHEMA)
