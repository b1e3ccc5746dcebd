"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata. The Spark-side schema, partitioning, UDF
signatures and batch shapes are real and tested; the actual media
decode runs through Pillow when importable (decoder='pil'/'auto') and
otherwise through `decode_stub` — a deterministic fake so tests are
reproducible in this container (which has no decode libs). Audio/video
decode (libav) remains an open integration point.
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


def _pil_available() -> bool:
    try:  # extras gate: Pillow is optional and absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_real(payload: bytes) -> np.ndarray:
    """Real image decode via Pillow when importable (extras path):
    bytes -> grayscale uint8 array. Raises NotImplementedError with the
    integration context when Pillow is absent — callers pick the path
    explicitly via extract_features(decoder=...)."""
    try:
        import io

        from PIL import Image
    except ImportError as exc:  # pragma: no cover — no Pillow here
        raise NotImplementedError(
            "decoder='pil' requires Pillow, which is not installed in "
            "this environment; use decoder='stub' (deterministic fake) "
            "or install the extras"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("L")  # pragma: no cover
    return np.asarray(img, dtype=np.uint8)  # pragma: no cover


def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded pixels from payload hash."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def extract_features(
    media: DataFrame, resize: tuple[int, int] = (8, 8), decoder: str = "auto"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: decode ->
    resize -> mean/std features. Batch shape and schema are the real
    production contract. decoder: 'stub' (deterministic fake, the test
    path), 'pil' (real Pillow decode, raises if Pillow is absent), or
    'auto' (pil when importable on the DRIVER, else stub — resolved
    before the closure ships so every executor uses the same path)."""
    rh, rw = resize
    if decoder == "auto":
        decoder = "pil" if _pil_available() else "stub"
    if decoder not in ("stub", "pil"):
        raise ValueError(f"unknown decoder {decoder!r}")
    use_pil = decoder == "pil"

    def feats(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if use_pil:
                    img = _decode_image_real(bytes(r.payload))
                else:
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
