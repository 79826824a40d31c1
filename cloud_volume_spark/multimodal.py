"""Multimodal asset columns: image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature plumbing.

The asset table:

    assets(asset_id LONG, kind STRING,          -- image|audio|video
           blob BINARY, fmt STRING,
           width INT, height INT,               -- image/video
           sample_rate INT, duration_ms INT)    -- audio/video

The Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media decode is STUBBED — the
image/audio codec libraries are not in this container. Each decode
function first tries the real library (PIL/soundfile) and otherwise
uses ``FakeCodec``, a deterministic stand-in that "decodes" a blob into
a pseudo-pixel array derived from its bytes, so feature extraction,
resize, and frame sampling have exact, testable semantics end to end.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, FloatType, IntegerType, LongType,
    StringType, StructField, StructType,
)

try:  # pragma: no cover - optional dep
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:  # pragma: no cover
    HAS_PIL = False

ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("kind", StringType(), False),
    StructField("blob", BinaryType(), False),
    StructField("fmt", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("sample_rate", IntegerType(), True),
    StructField("duration_ms", IntegerType(), True),
])


class FakeCodec:
    """Deterministic stand-in decoder: bytes → uint8 array whose values
    are a keyed hash stream. Same blob → same 'pixels', any shape."""

    @staticmethod
    def decode_image(blob: bytes, width: int, height: int, channels: int = 3) -> np.ndarray:
        n = width * height * channels
        out = np.empty(n, dtype=np.uint8)
        seed = hashlib.md5(blob).digest()
        # expand the 16-byte digest into a deterministic byte stream
        reps = (n + 15) // 16
        stream = np.frombuffer(
            b"".join(
                hashlib.md5(seed + i.to_bytes(4, "little")).digest()
                for i in range(reps)
            ),
            dtype=np.uint8,
        )
        out[:] = stream[:n]
        return out.reshape(height, width, channels)

    @staticmethod
    def decode_audio(blob: bytes, n_samples: int) -> np.ndarray:
        raw = FakeCodec.decode_image(blob, n_samples, 1, 1).ravel()
        return (raw.astype(np.float32) - 127.5) / 127.5


def decode_image_real(blob: bytes) -> np.ndarray:  # pragma: no cover
    if not HAS_PIL:
        raise NotImplementedError(
            "real image decode requires PIL; this container has no image "
            "codecs — FakeCodec provides the deterministic test path"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(blob)))


IMAGE_FEATURES_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("mean_luma", DoubleType(), False),
    StructField("std_luma", DoubleType(), False),
    StructField("entropy_bits", DoubleType(), False),
    StructField("aspect_ratio", DoubleType(), False),
])


def image_features(assets: DataFrame) -> DataFrame:
    """Decode → per-image feature extraction, Arrow-batched. The
    feature math is real; decode goes through FakeCodec when no codec
    library exists."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = FakeCodec.decode_image(r.blob, r.width, r.height)
                luma = img.astype(np.float64).mean(axis=2)
                hist = np.bincount(img.ravel(), minlength=256)
                p = hist[hist > 0] / hist.sum()
                rows.append((
                    int(r.asset_id),
                    float(luma.mean()),
                    float(luma.std()),
                    float(-(p * np.log2(p)).sum()),
                    float(r.width / r.height),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "blob", "width", "height")
        .mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)
    )


RESIZED_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("width", IntegerType(), False),
    StructField("height", IntegerType(), False),
    StructField("pixels", BinaryType(), False),
])


def image_resize(assets: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h) — the batch-shape
    contract for a training-data image pipeline; swap FakeCodec for a
    real decoder without touching the Spark plumbing."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = FakeCodec.decode_image(r.blob, r.width, r.height)
                ys = (np.arange(out_h) * r.height // out_h).astype(np.int64)
                xs = (np.arange(out_w) * r.width // out_w).astype(np.int64)
                small = img[np.ix_(ys, xs)]
                rows.append((int(r.asset_id), out_w, out_h, small.tobytes()))
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "image")
        .select("asset_id", "blob", "width", "height")
        .mapInPandas(resize, schema=RESIZED_SCHEMA)
    )


FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_idx", IntegerType(), False),
    StructField("ts_ms", IntegerType(), False),
    StructField("pixels", BinaryType(), False),
])


def video_frame_sample(assets: DataFrame, every_ms: int = 1000,
                       frame_w: int = 32, frame_h: int = 32) -> DataFrame:
    """Frame sampling: one pseudo-frame per ``every_ms`` of duration —
    the fan-out shape (1 row → N frame rows) of a video pipeline."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n_frames = max(1, int(r.duration_ms) // every_ms)
                for i in range(n_frames):
                    frame_blob = r.blob + i.to_bytes(4, "little")
                    img = FakeCodec.decode_image(frame_blob, frame_w, frame_h)
                    rows.append((
                        int(r.asset_id), i, i * every_ms, img.tobytes()
                    ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "video")
        .select("asset_id", "blob", "duration_ms")
        .mapInPandas(sample, schema=FRAME_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("rms", DoubleType(), False),
    StructField("zero_crossings", LongType(), False),
    StructField("n_samples", LongType(), False),
])


def audio_features(assets: DataFrame) -> DataFrame:
    """RMS + zero-crossing count over decoded samples."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n = int(r.sample_rate) * int(r.duration_ms) // 1000
                x = FakeCodec.decode_audio(r.blob, max(n, 1))
                rows.append((
                    int(r.asset_id),
                    float(np.sqrt((x.astype(np.float64) ** 2).mean())),
                    int(np.sum(np.signbit(x[1:]) != np.signbit(x[:-1]))),
                    len(x),
                ))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return (
        assets.where(F.col("kind") == "audio")
        .select("asset_id", "blob", "sample_rate", "duration_ms")
        .mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# driver-contract adapters: a deterministic asset table derived from the
# documents table, so the multimodal plumbing runs under the driver's
# (rows-only) correctness checks at any scale factor.
# ---------------------------------------------------------------------------

def assets_from_documents(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("blob"),
        F.lit("fake").alias("fmt"),
        F.when(F.col("doc_id") % 3 != 1, F.lit(64)).cast("int").alias("width"),
        F.when(F.col("doc_id") % 3 != 1, F.lit(48)).cast("int").alias("height"),
        F.when(F.col("doc_id") % 3 == 1, F.lit(8000)).cast("int").alias("sample_rate"),
        F.when(F.col("doc_id") % 3 != 0, F.lit(2500)).cast("int").alias("duration_ms"),
    )


def mm_image_features(spark, sf_dir: str) -> DataFrame:
    return image_features(assets_from_documents(spark, sf_dir))


def mm_image_resize(spark, sf_dir: str) -> DataFrame:
    out = image_resize(assets_from_documents(spark, sf_dir), 16, 12)
    # driver value-hash: binary pixels replaced by a stable digest
    return out.select(
        "asset_id", "width", "height", F.md5("pixels").alias("pixels_md5")
    )


def mm_video_frame_sample(spark, sf_dir: str) -> DataFrame:
    out = video_frame_sample(
        assets_from_documents(spark, sf_dir), every_ms=1000, frame_w=8, frame_h=8
    )
    return out.select(
        "asset_id", "frame_idx", "ts_ms", F.md5("pixels").alias("pixels_md5")
    )


def mm_audio_features(spark, sf_dir: str) -> DataFrame:
    return audio_features(assets_from_documents(spark, sf_dir))


def mm_asset_stats(spark, sf_dir: str) -> DataFrame:
    """Asset-table statistics computed on the opaque blob column itself
    (byte length, digest, per-kind metadata) — fully SQL-expressible,
    so the multimodal block's asset derivation and blob handling get a
    real cross-engine oracle row even though the FakeCodec pixel
    stream does not (DuckDB's md5 is VARCHAR-only; the decode stream
    feeds digest bytes back into md5 and so cannot be re-expressed
    there — those four operators carry exact-value pytest oracles in
    tests/test_multimodal.py instead)."""
    assets = assets_from_documents(spark, sf_dir)
    return assets.select(
        "asset_id", "kind",
        F.length("blob").alias("byte_len"),
        F.md5("blob").alias("blob_md5"),
        F.coalesce(F.col("width"), F.lit(-1)).alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).alias("height"),
        F.coalesce(F.col("sample_rate"), F.lit(-1)).alias("sample_rate"),
        F.coalesce(F.col("duration_ms"), F.lit(-1)).alias("duration_ms"),
    )


MM_ASSET_STATS_SQL = """
SELECT doc_id AS asset_id,
       ['image', 'audio', 'video'][(doc_id % 3)::INT + 1] AS kind,
       OCTET_LENGTH(ENCODE(text)) AS byte_len,
       MD5(text) AS blob_md5,
       CASE WHEN doc_id % 3 != 1 THEN 64 ELSE -1 END AS width,
       CASE WHEN doc_id % 3 != 1 THEN 48 ELSE -1 END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE -1 END AS sample_rate,
       CASE WHEN doc_id % 3 != 0 THEN 2500 ELSE -1 END AS duration_ms
FROM documents
"""


QUERIES = {
    "mm_image_features": mm_image_features,
    "mm_image_resize": mm_image_resize,
    "mm_video_frame_sample": mm_video_frame_sample,
    "mm_audio_features": mm_audio_features,
    "mm_asset_stats": mm_asset_stats,
}

# FakeCodec md5-stream decode is not SQL-expressible (see
# mm_asset_stats docstring): the four decode-path entries get
# rows-only driver checks + exact-value pytest oracles; the asset
# derivation itself is fully oracle-checked.
ORACLE_SQL: dict = {
    "mm_asset_stats": MM_ASSET_STATS_SQL,
}
