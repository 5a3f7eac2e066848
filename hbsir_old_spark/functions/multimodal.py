"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is STUBBED:
``decode_image``/``decode_audio`` raise NotImplementedError unless a
deterministic fake decoder is requested. Everything Spark-side is real and
tested — schemas, batch iteration, partitioning, UDF signatures — so
swapping in PIL/torchaudio later touches only ``_real_decode_*``.

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
    ]
)


def _real_decode_image(content: bytes) -> np.ndarray:
    raise NotImplementedError(
        "image codecs are not available in this container; "
        "install pillow and decode here (bytes -> HxWxC array)"
    )


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

    With ``use_fake_decoder=False`` this calls the real (stubbed) codecs and
    raises NotImplementedError — the documented extension point.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_fake_decoder:
                for kind, content in zip(pdf["kind"], pdf["content"]):
                    if kind == "audio":
                        _real_decode_audio(content)
                    else:
                        _real_decode_image(content)
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_sha": pdf["content"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": pdf["content"].map(lambda b: _fake_features(b).tolist()),
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
