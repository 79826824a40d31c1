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
    are a keyed hash stream. Same blob → same 'pixels', any shape.

    The stream is keyed on *hex strings* — block ``i`` of the pixel
    stream is ``md5(seed_hex + '|' + str(i))`` where ``seed_hex =
    md5(blob).hexdigest()`` — so a SQL engine whose md5 is
    VARCHAR-only (DuckDB) can regenerate the identical byte stream:
    every mm_* driver query therefore carries a full cross-engine
    oracle."""

    _SUFFIXES: dict = {}  # reps -> [b"0", b"1", ...] (shared per task)

    @staticmethod
    def stream(seed_hex: str, n: int) -> np.ndarray:
        # hot loop (one md5 per 16 output bytes): the block-index byte
        # strings are constant across rows of one kind, so they are
        # built once per worker, and the per-block work is a bytes
        # concat + md5 — no per-block str(i) conversion or re-encode.
        # Digests unchanged: (seed + '|' + str(i)).encode() == prefix
        # bytes + suffix bytes.
        reps = (n + 15) // 16
        sufs = FakeCodec._SUFFIXES.get(reps)
        if sufs is None:
            sufs = [str(i).encode("ascii") for i in range(reps)]
            FakeCodec._SUFFIXES[reps] = sufs
        pre = (seed_hex + "|").encode("ascii")
        md5 = hashlib.md5
        raw = b"".join([md5(pre + s).digest() for s in sufs])
        return np.frombuffer(raw, dtype=np.uint8)[:n]

    @staticmethod
    def decode_image(blob: bytes, width: int, height: int,
                     channels: int = 3, seed_hex: str | None = None) -> np.ndarray:
        if seed_hex is None:
            seed_hex = hashlib.md5(blob).hexdigest()
        n = width * height * channels
        return FakeCodec.stream(seed_hex, n).reshape(height, width, channels)

    @staticmethod
    def frame_seed(blob: bytes, frame_idx: int) -> str:
        """Per-frame stream key: md5(md5(blob) || '#' || idx), all in
        hex-string space so it round-trips through SQL md5."""
        return hashlib.md5(
            (hashlib.md5(blob).hexdigest() + "#" + str(frame_idx)).encode("ascii")
        ).hexdigest()

    @staticmethod
    def decode_audio(blob: bytes, n_samples: int) -> np.ndarray:
        raw = FakeCodec.decode_image(blob, n_samples, 1, 1).ravel()
        return (raw.astype(np.float32) - 127.5) / 127.5


def decode_image_real(blob: bytes) -> np.ndarray:
    """Decode an actually-encoded image blob: PIL when installed, else
    the repo's pure-Python PNG/JPEG codecs by magic-byte sniffing — so
    the real-decode branch works (and is tested) even in containers
    with no imaging libraries."""
    blob = bytes(blob)
    if HAS_PIL:  # pragma: no cover — PIL absent in the test container
        import io

        return np.asarray(Image.open(io.BytesIO(blob)))
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from cloud_volume_spark import png_io

        return png_io.decode(blob)
    if blob[:2] == b"\xff\xd8":
        from cloud_volume_spark import jpeg_io

        return jpeg_io.decode(blob)
    raise NotImplementedError(
        f"unrecognized image magic {blob[:4]!r}: PNG and JPEG decode "
        "pure-Python; other formats need PIL installed"
    )


def _decode_rgb(decode: str, blob: bytes, width: int, height: int) -> np.ndarray:
    """Dispatch FakeCodec vs real decode, normalized to (H, W, 3) uint8."""
    if decode == "real":
        img = decode_image_real(blob)
        # bit depth first: 16-bit channels scale to 8 (high byte)
        if img.dtype != np.uint8:
            if img.dtype == np.uint16:
                img = (img >> 8).astype(np.uint8)
            else:
                img = np.clip(img, 0, 255).astype(np.uint8)
        # then channel count: gray -> RGB, gray+alpha/RGBA drop alpha
        if img.ndim == 2:
            img = np.stack([img, img, img], axis=-1)
        elif img.shape[2] == 2:  # gray + alpha (PNG color type 4)
            g = img[:, :, 0]
            img = np.stack([g, g, g], axis=-1)
        elif img.shape[2] == 4:
            img = img[:, :, :3]
        return np.ascontiguousarray(img)
    if decode != "fake":
        raise ValueError(f"decode must be 'fake' or 'real', got {decode!r}")
    return FakeCodec.decode_image(blob, width, height)


IMAGE_FEATURES_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("mean_luma", DoubleType(), False),
    StructField("std_luma", DoubleType(), False),
    StructField("entropy_bits", DoubleType(), False),
    StructField("aspect_ratio", DoubleType(), False),
])


def image_features(assets: DataFrame, decode: str = "fake") -> DataFrame:
    """Decode → per-image feature extraction, Arrow-batched. The
    feature math is real; ``decode='fake'`` (default, and what the
    oracle-checked queries register — the FakeCodec stream is
    regenerable in SQL) uses the deterministic stand-in stream,
    ``decode='real'`` decodes the blob bytes (PIL, or the pure-Python
    PNG/JPEG codecs) and takes dimensions from the decoded array.

    mean/std are computed from exact integer sums (sum of bytes, sum of
    squared per-pixel 3-byte sums) followed by one fixed float
    expression — every intermediate is exact in float64, so any engine
    evaluating the same closed form (see MM_IMAGE_FEATURES_SQL)
    reproduces the doubles bit-for-bit regardless of summation order."""
    import math

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_rgb(decode, r.blob, r.width, r.height)
                height, width = img.shape[:2]
                npix = width * height
                s3 = img.astype(np.int64).sum(axis=2)
                s1 = int(s3.sum())
                s2 = int((s3 * s3).sum())
                mean = s1 / (3.0 * npix)
                var = s2 / (9.0 * npix) - mean * mean
                hist = np.bincount(img.ravel(), minlength=256)
                p = hist[hist > 0] / hist.sum()
                rows.append((
                    int(r.asset_id),
                    mean,
                    math.sqrt(var if var > 0 else 0.0),
                    float(-(p * np.log2(p)).sum()),
                    float(width / height),
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


def image_resize(assets: DataFrame, out_w: int, out_h: int,
                 decode: str = "fake") -> DataFrame:
    """Nearest-neighbor resize to (out_w, out_h) — the batch-shape
    contract for a training-data image pipeline. ``decode='real'``
    decodes the blob bytes (PIL or the pure-Python PNG/JPEG codecs)
    instead of the FakeCodec stream; the Spark plumbing is identical."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_rgb(decode, r.blob, r.width, r.height)
                height, width = img.shape[:2]
                ys = (np.arange(out_h) * height // out_h).astype(np.int64)
                xs = (np.arange(out_w) * width // out_w).astype(np.int64)
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
                    img = FakeCodec.decode_image(
                        r.blob, frame_w, frame_h,
                        seed_hex=FakeCodec.frame_seed(r.blob, i),
                    )
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
    """RMS + zero-crossing count over decoded samples.

    RMS of the normalized signal ``x = (b - 127.5)/127.5`` is computed
    as ``sqrt(sum((b-127.5)^2) / (127.5^2 * n))``: each ``(b-127.5)^2``
    term is a dyadic rational exact in float64 and the running sum stays
    well under 2^53, so the sum is exact in any order and the final
    divide+sqrt are single correctly-rounded ops — bit-identical across
    engines (see MM_AUDIO_FEATURES_SQL). A zero crossing is a sign flip
    of x, i.e. of ``b <= 127``."""
    import math

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                n = max(int(r.sample_rate) * int(r.duration_ms) // 1000, 1)
                raw = FakeCodec.decode_image(r.blob, n, 1, 1).ravel()
                s = float(((raw.astype(np.float64) - 127.5) ** 2).sum())
                neg = raw <= 127
                rows.append((
                    int(r.asset_id),
                    math.sqrt(s / (127.5 * 127.5 * n)),
                    int(np.sum(neg[1:] != neg[:-1])),
                    n,
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
    # spread (guide §2.5): every mm_* query funnels through a
    # mapInPandas decode whose per-row Python cost dominates; on the
    # single-split test parquet that stage otherwise runs as ONE task
    from cloud_volume_spark.operators.common import load_spread

    docs = load_spread(spark, sf_dir, "documents")
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
    # mean/std/aspect are bit-deterministic closed forms (see
    # image_features); entropy sums 256 log2 terms whose order differs
    # between engines, so it alone is rounded for the value-hash.
    return image_features(assets_from_documents(spark, sf_dir)).withColumn(
        "entropy_bits", F.round("entropy_bits", 4)
    )


def mm_image_resize(spark, sf_dir: str) -> DataFrame:
    out = image_resize(assets_from_documents(spark, sf_dir), 16, 12)
    # driver value-hash: binary pixels digested via their lowercase hex
    # (DuckDB md5 is VARCHAR-only, so hex-space md5 is the cross-engine
    # common denominator)
    return out.select(
        "asset_id", "width", "height",
        F.md5(F.lower(F.hex("pixels"))).alias("pixels_md5"),
    )


def mm_video_frame_sample(spark, sf_dir: str) -> DataFrame:
    out = video_frame_sample(
        assets_from_documents(spark, sf_dir), every_ms=1000, frame_w=8, frame_h=8
    )
    return out.select(
        "asset_id", "frame_idx", "ts_ms",
        F.md5(F.lower(F.hex("pixels"))).alias("pixels_md5"),
    )


def mm_audio_features(spark, sf_dir: str) -> DataFrame:
    return audio_features(assets_from_documents(spark, sf_dir))


def mm_asset_stats(spark, sf_dir: str) -> DataFrame:
    """Asset-table statistics computed on the opaque blob column itself
    (byte length, digest, per-kind metadata) — the simplest of the
    multimodal oracle rows: it validates the asset derivation and blob
    handling, while the four decode-path oracles above regenerate the
    FakeCodec pixel stream in SQL."""
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
       OCTET_LENGTH(ENCODE(text))::INT AS byte_len,
       MD5(text) AS blob_md5,
       CASE WHEN doc_id % 3 != 1 THEN 64 ELSE -1 END AS width,
       CASE WHEN doc_id % 3 != 1 THEN 48 ELSE -1 END AS height,
       CASE WHEN doc_id % 3 = 1 THEN 8000 ELSE -1 END AS sample_rate,
       CASE WHEN doc_id % 3 != 0 THEN 2500 ELSE -1 END AS duration_ms
FROM documents
"""


# ---------------------------------------------------------------------------
# cross-engine oracles: FakeCodec's stream is keyed on hex-string md5
# (block i of seed s = md5(s || '|' || i)), so DuckDB regenerates the
# exact byte stream with MD5/SUBSTR/STRPOS.  _HEXVAL extracts byte j of
# a 32-char digest hex string as an integer.
# ---------------------------------------------------------------------------

_HEXVAL = (
    "STRPOS('0123456789abcdef', SUBSTR(bh, 2*j + 1, 1)) * 16"
    " + STRPOS('0123456789abcdef', SUBSTR(bh, 2*j + 2, 1)) - 17"
)

# images: doc_id % 3 = 0, 64x48x3 = 9216 bytes = 576 blocks, 3072 px
MM_IMAGE_FEATURES_SQL = f"""
WITH img AS (
    SELECT doc_id AS asset_id, MD5(text) AS seed
    FROM documents WHERE doc_id % 3 = 0
), blocks AS (
    SELECT asset_id, blk, MD5(seed || '|' || blk) AS bh
    FROM img, generate_series(0, 575) b(blk)
), bytes AS (
    SELECT asset_id, blk * 16 + j AS idx, {_HEXVAL} AS val
    FROM blocks, generate_series(0, 15) g(j)
), px AS (
    SELECT asset_id, idx // 3 AS p, SUM(val) AS s3
    FROM bytes GROUP BY 1, 2
), moments AS (
    SELECT asset_id, SUM(s3)::DOUBLE AS s1, SUM(s3 * s3)::DOUBLE AS s2
    FROM px GROUP BY 1
), ent AS (
    SELECT asset_id, -SUM((c / 9216.0) * LOG2(c / 9216.0)) AS entropy
    FROM (SELECT asset_id, val, COUNT(*)::DOUBLE AS c FROM bytes GROUP BY 1, 2)
    GROUP BY 1
)
SELECT m.asset_id,
       m.s1 / (3.0 * 3072) AS mean_luma,
       SQRT(m.s2 / (9.0 * 3072)
            - (m.s1 / (3.0 * 3072)) * (m.s1 / (3.0 * 3072))) AS std_luma,
       ROUND(e.entropy, 4) AS entropy_bits,
       64.0 / 48.0 AS aspect_ratio
FROM moments m JOIN ent e USING (asset_id)
"""

# resize 64x48 -> 16x12 nearest-neighbor: output byte (oy, ox, c) is
# source byte ((oy*4)*64 + ox*4)*3 + c; pixels_md5 = md5 of the
# lowercase hex of the gathered bytes (a digest hex pair per byte)
MM_IMAGE_RESIZE_SQL = """
WITH img AS (
    SELECT doc_id AS asset_id, MD5(text) AS seed
    FROM documents WHERE doc_id % 3 = 0
), pos AS (
    SELECT asset_id, seed, oy.y AS oy, ox.x AS ox, ch.c AS c,
           ((oy.y * 4) * 64 + ox.x * 4) * 3 + ch.c AS idx
    FROM img,
         generate_series(0, 11) oy(y),
         generate_series(0, 15) ox(x),
         generate_series(0, 2) ch(c)
), gathered AS (
    SELECT asset_id, oy, ox, c,
           SUBSTR(MD5(seed || '|' || (idx // 16)), 2 * (idx % 16) + 1, 2)
               AS hexpair
    FROM pos
)
SELECT asset_id, 16 AS width, 12 AS height,
       MD5(STRING_AGG(hexpair, '' ORDER BY oy, ox, c)) AS pixels_md5
FROM gathered GROUP BY asset_id
"""

# video: doc_id % 3 = 2, duration 2500ms -> 2 frames of 8x8x3 = 192
# bytes = 12 whole digests, so the frame's hex is just the concatenated
# block hashes
MM_VIDEO_FRAME_SAMPLE_SQL = """
WITH vid AS (
    SELECT doc_id AS asset_id, MD5(text) AS seed
    FROM documents WHERE doc_id % 3 = 2
), frames AS (
    SELECT asset_id, f.i AS frame_idx, MD5(seed || '#' || f.i) AS fseed
    FROM vid, generate_series(0, 1) f(i)
), blocks AS (
    SELECT asset_id, frame_idx, blk, MD5(fseed || '|' || blk) AS bh
    FROM frames, generate_series(0, 11) b(blk)
)
SELECT asset_id, frame_idx::INT AS frame_idx,
       (frame_idx * 1000)::INT AS ts_ms,
       MD5(STRING_AGG(bh, '' ORDER BY blk)) AS pixels_md5
FROM blocks GROUP BY asset_id, frame_idx
"""

# audio: doc_id % 3 = 1, 8000 Hz * 2.5 s = 20000 samples = 1250 blocks
MM_AUDIO_FEATURES_SQL = f"""
WITH aud AS (
    SELECT doc_id AS asset_id, MD5(text) AS seed
    FROM documents WHERE doc_id % 3 = 1
), blocks AS (
    SELECT asset_id, blk, MD5(seed || '|' || blk) AS bh
    FROM aud, generate_series(0, 1249) b(blk)
), bytes AS (
    SELECT asset_id, blk * 16 + j AS idx, {_HEXVAL} AS val
    FROM blocks, generate_series(0, 15) g(j)
), lagged AS (
    SELECT asset_id, val,
           LAG(val) OVER (PARTITION BY asset_id ORDER BY idx) AS pv
    FROM bytes
)
SELECT asset_id,
       SQRT(SUM((val - 127.5) * (val - 127.5)) / (127.5 * 127.5 * 20000)) AS rms,
       SUM(CASE WHEN pv IS NOT NULL AND (val <= 127) != (pv <= 127)
                THEN 1 ELSE 0 END)::BIGINT AS zero_crossings,
       20000::BIGINT AS n_samples
FROM lagged GROUP BY asset_id
"""


QUERIES = {
    "mm_image_features": mm_image_features,
    "mm_image_resize": mm_image_resize,
    "mm_video_frame_sample": mm_video_frame_sample,
    "mm_audio_features": mm_audio_features,
    "mm_asset_stats": mm_asset_stats,
}

ORACLE_SQL: dict = {
    "mm_image_features": MM_IMAGE_FEATURES_SQL,
    "mm_image_resize": MM_IMAGE_RESIZE_SQL,
    "mm_video_frame_sample": MM_VIDEO_FRAME_SAMPLE_SQL,
    "mm_audio_features": MM_AUDIO_FEATURES_SQL,
    "mm_asset_stats": MM_ASSET_STATS_SQL,
}
