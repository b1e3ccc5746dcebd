"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata. The Spark-side schema, partitioning, UDF
signatures and batch shapes are real and tested; the actual media
decode is STUBBED (decode libs are not in this container) behind
`decode_stub` — a deterministic fake so tests are reproducible.
Swap `_decode_image_real` in when PIL/libav are available.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int,"
    " duration_ms int"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media payloads derived from text (plumbing
    fixture: binary column + typed metadata)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.to_binary(F.sha2(F.col("text"), 256), F.lit("hex")).alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        (F.col("doc_id") % 10000).cast("int").alias("duration_ms"),
    )


def _decode_image_real(payload: bytes) -> np.ndarray:  # pragma: no cover
    raise NotImplementedError(
        "media decode requires PIL/av which are not in this container; "
        "this stub marks the integration point (see decode_stub)"
    )


def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded pixels from payload hash."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def extract_features(media: DataFrame, resize: tuple[int, int] = (8, 8)) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: decode
    (stubbed) -> resize -> mean/std features. Batch shape and schema are
    the real production contract."""
    rh, rw = resize

    def feats(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = decode_stub(bytes(r.payload), int(r.width), int(r.height))
                # nearest-neighbour resize without PIL
                ys = (np.arange(rh) * img.shape[0] // rh)
                xs = (np.arange(rw) * img.shape[1] // rw)
                small = img[np.ix_(ys, xs)].astype(np.float64)
                rows.append(
                    {
                        "doc_id": int(r.doc_id),
                        "media_type": r.media_type,
                        "mean_px": float(small.mean()),
                        "std_px": float(small.std()),
                        "thumb": small.ravel().tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        feats,
        schema="doc_id long, media_type string, mean_px double, std_px double,"
        " thumb array<double>",
    )


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: one row per sampled timestamp (the
    Spark-side fan-out; actual frame decode stubbed)."""
    v = media.where(F.col("media_type") == "video")
    return v.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("ts_ms"),
    )
