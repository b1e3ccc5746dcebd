"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, decoded and featurized inside Arrow-batched UDFs.

The decode paths are REAL for the three self-describing uncompressed
container formats that need no third-party libraries:

- audio  — RIFF/WAVE PCM, parsed with the stdlib `wave` module and
  `np.frombuffer` (real DSP features: RMS, zero-crossing rate,
  spectral centroid via rFFT);
- image  — binary netpbm (PGM `P5` grayscale / PPM `P6` RGB), parsed
  with a small header reader + `np.frombuffer`;
- video  — YUV4MPEG2 (`.y4m`), header + fixed-size frame parsing; the
  luma plane of any frame is a real grayscale image.

Compressed formats (PNG/JPEG/...) route through Pillow when importable
(extras gate — absent in this container); `decode_stub` remains ONLY as
the explicit fallback for payloads no available decoder understands, so
tests stay reproducible anywhere. synthesize_media now emits VALID
WAV/PGM/Y4M bytes (deterministic, seeded from the doc text), so the
real parsers are what the tests and the contract exercise.

Scale shape: every operator here is mapInPandas over the binary column
— payload bytes stay in the executors, one Arrow batch at a time; no
driver collect, no shuffle beyond the source partitioning. At 100 TB
the same plan holds: media rows partition by doc_id, decode is
embarrassingly parallel, and feature rows are tiny relative to input.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, payload binary, width int, height int,"
    " duration_ms int"
)

AUDIO_RATE = 8000  # fixture sample rate (Hz)
VIDEO_FPS = 10  # fixture frame rate


# ---------------------------------------------------------------------------
# Real encoders (fixture writers) and decoders — no third-party libs
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = AUDIO_RATE) -> bytes:
    """Write mono 16-bit PCM WAV bytes (stdlib wave)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Real WAV decode: bytes -> (mono int16 samples, sample_rate).
    Multi-channel input is averaged to mono."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif width == 1:  # unsigned 8-bit PCM
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        samples <<= 8
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if n_ch > 1:
        samples = samples[: len(samples) - len(samples) % n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1).astype(np.int32)
    return samples.astype(np.int16), rate


def encode_pgm(img: np.ndarray) -> bytes:
    """Write binary PGM (netpbm P5) bytes from a 2-D uint8 array."""
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        img, dtype=np.uint8
    ).tobytes()


def decode_netpbm(payload: bytes) -> np.ndarray:
    """Real netpbm decode: P5 (grayscale) or P6 (RGB, converted to
    grayscale by the BT.601 luma weights) -> 2-D uint8 array."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, with '#' comments; pixel data starts after the single
    # whitespace byte following maxval
    tokens: list[int] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    if magic == b"P5":
        img = np.frombuffer(payload, dtype=np.uint8, count=w * h, offset=i)
        return img.reshape(h, w).copy()
    rgb = np.frombuffer(payload, dtype=np.uint8, count=3 * w * h, offset=i)
    rgb = rgb.reshape(h, w, 3).astype(np.float64)
    return (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: int = VIDEO_FPS) -> bytes:
    """Write YUV4MPEG2 bytes from (n, h, w) uint8 luma frames (C420
    with flat chroma planes)."""
    n, h, w = frames.shape
    out = [b"YUV4MPEG2 W%d H%d F%d:1 Ip A1:1 C420\n" % (w, h, fps)]
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    for k in range(n):
        out.append(b"FRAME\n")
        out.append(
            np.ascontiguousarray(frames[k], dtype=np.uint8).tobytes()
        )
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """Real YUV4MPEG2 decode: bytes -> ((n, h, w) uint8 luma frames,
    fps). Chroma planes are parsed past but not returned (grayscale
    features)."""
    if not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = payload.index(b"\n")
    w = h = fps = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
    if not (w and h):
        raise ValueError("y4m header missing W/H")
    y_size = w * h
    c_size = (w // 2) * (h // 2)
    frame_size = y_size + 2 * c_size
    frames = []
    i = nl + 1
    while i < len(payload):
        j = payload.index(b"\n", i)  # FRAME line (may carry params)
        if payload[i:j][:5] != b"FRAME":
            raise ValueError("corrupt y4m frame marker")
        i = j + 1
        frames.append(
            np.frombuffer(payload, dtype=np.uint8, count=y_size, offset=i)
            .reshape(h, w)
        )
        i += frame_size
    return np.stack(frames) if frames else np.zeros((0, h, w), np.uint8), (
        fps or VIDEO_FPS
    )


def _pil_available() -> bool:
    try:  # extras gate: Pillow is optional and absent in this container
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_pil(payload: bytes) -> np.ndarray:
    """Compressed-image decode via Pillow when importable (extras
    path). Raises NotImplementedError with the integration context when
    Pillow is absent."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover — no Pillow here
        raise NotImplementedError(
            "compressed-image decode requires Pillow, which is not "
            "installed in this environment; supply netpbm payloads "
            "(decoded natively) or install the extras"
        ) from exc
    img = Image.open(io.BytesIO(payload)).convert("L")  # pragma: no cover
    return np.asarray(img, dtype=np.uint8)  # pragma: no cover


# backwards-compatible alias (older tests/docs call this name)
_decode_image_real = _decode_image_pil


def decode_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: seeded pixels from payload hash. The
    explicit fallback for payloads no available decoder understands."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width), dtype=np.uint8)


def _decode_to_grid(
    payload: bytes, media_type: str, width: int, height: int, decoder: str
) -> np.ndarray:
    """Route a payload to its real decoder by magic bytes and reduce to
    a 2-D uint8 grid (pixels / waveform envelope / middle keyframe)."""
    # metadata dims are 0 for non-image modalities; the stub needs a
    # non-degenerate grid to fake
    sw, sh = max(width, 8), max(height, 8)
    if decoder == "stub":
        return decode_stub(payload, sw, sh)
    if payload[:4] == b"RIFF":
        samples, _ = decode_wav(payload)
        # envelope grid: |x| bucket-means folded to rows (keeps the one
        # feature schema across modalities)
        n_bins = 64
        if len(samples) == 0:
            return np.zeros((8, 8), dtype=np.uint8)
        pad = (-len(samples)) % n_bins
        env = np.abs(samples.astype(np.float64))
        env = np.concatenate([env, np.zeros(pad)]).reshape(n_bins, -1).mean(1)
        peak = env.max()
        if peak > 0:
            env = env / peak * 255.0
        return env.astype(np.uint8).reshape(8, 8)
    if payload[:2] in (b"P5", b"P6"):
        return decode_netpbm(payload)
    if payload[:9] == b"YUV4MPEG2":
        frames, _ = decode_y4m(payload)
        if len(frames) == 0:
            return np.zeros((height, width), dtype=np.uint8)
        return frames[len(frames) // 2]
    if decoder == "pil" or (decoder == "auto_pil"):
        return _decode_image_pil(payload)
    return decode_stub(payload, sw, sh)


# ---------------------------------------------------------------------------
# Fixture: deterministic VALID media payloads
# ---------------------------------------------------------------------------

def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic media payloads derived from the doc text — now
    VALID container bytes (WAV / PGM / Y4M) so the real parsers do real
    work in tests and the contract. Runs in mapInPandas (payload
    generation is per-row by nature; it is a fixture, not a hot path).
    Metadata columns describe the actual payload (true dims/duration)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                doc_id = int(r.doc_id)
                seed = int.from_bytes(
                    hashlib.sha256(str(r.text).encode()).digest()[:8], "little"
                )
                rng = np.random.default_rng(seed)
                kind = ("image", "audio", "video")[doc_id % 3]
                if kind == "image":
                    w = doc_id % 24 * 2 + 16
                    h = doc_id % 16 * 2 + 16
                    payload = encode_pgm(
                        rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                    )
                    dur = 0
                elif kind == "audio":
                    dur = doc_id % 400 + 50  # ms
                    n = AUDIO_RATE * dur // 1000
                    t = np.arange(n) / AUDIO_RATE
                    freq = 200 + seed % 1800
                    sig = 0.6 * np.sin(2 * np.pi * freq * t)
                    sig += 0.1 * rng.standard_normal(n)
                    payload = encode_wav(
                        np.clip(sig * 32767, -32768, 32767).astype(np.int16)
                    )
                    w = h = 0
                else:
                    w, h = 32, 24
                    nf = doc_id % 4 + 2
                    frames = rng.integers(
                        0, 256, size=(nf, h, w), dtype=np.uint8
                    )
                    payload = encode_y4m(frames)
                    dur = nf * 1000 // VIDEO_FPS
                rows.append(
                    {
                        "doc_id": doc_id,
                        "media_type": kind,
                        "payload": payload,
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.select("doc_id", "text").mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Feature extraction
# ---------------------------------------------------------------------------

def extract_features(
    media: DataFrame, resize: tuple[int, int] = (8, 8), decoder: str = "auto"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: decode ->
    grid -> resize -> mean/std + thumbnail. WAV/netpbm/Y4M payloads
    decode natively (by magic bytes); compressed images go through
    Pillow under decoder='pil'/'auto' (when importable); decoder='stub'
    forces the deterministic fake. 'auto' resolves Pillow availability
    on the DRIVER so every executor uses the same path."""
    rh, rw = resize
    if decoder == "auto":
        decoder = "auto_pil" if _pil_available() else "auto_stub"
    if decoder not in ("stub", "pil", "auto_pil", "auto_stub"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def feats(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = _decode_to_grid(
                    bytes(r.payload), r.media_type, int(r.width),
                    int(r.height), decoder,
                )
                # nearest-neighbour resize without PIL
                ys = np.arange(rh) * img.shape[0] // rh
                xs = np.arange(rw) * img.shape[1] // rw
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


def audio_features(media: DataFrame) -> DataFrame:
    """Real DSP features over WAV payloads: duration, RMS, zero-crossing
    rate, spectral centroid (rFFT). Non-audio rows are filtered out by
    a pushed media_type predicate; everything runs per Arrow batch."""

    def feats(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                samples, rate = decode_wav(bytes(r.payload))
                x = samples.astype(np.float64)
                n = len(x)
                if n == 0:
                    rows.append(
                        {"doc_id": int(r.doc_id), "sample_rate": rate,
                         "duration_s": 0.0, "rms": 0.0, "zcr": 0.0,
                         "spectral_centroid_hz": 0.0}
                    )
                    continue
                rms = float(np.sqrt(np.mean(x**2)))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                spec = np.abs(np.fft.rfft(x))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                denom = spec.sum()
                centroid = float((freqs * spec).sum() / denom) if denom else 0.0
                rows.append(
                    {
                        "doc_id": int(r.doc_id),
                        "sample_rate": int(rate),
                        "duration_s": n / rate,
                        "rms": rms,
                        "zcr": zcr,
                        "spectral_centroid_hz": centroid,
                    }
                )
            yield pd.DataFrame(rows)

    return (
        media.where(F.col("media_type") == "audio")
        .select("doc_id", "payload")
        .mapInPandas(
            feats,
            schema="doc_id long, sample_rate int, duration_s double, "
            "rms double, zcr double, spectral_centroid_hz double",
        )
    )


def frame_sample(
    media: DataFrame, every_ms: int = 1000, decode: bool = False
) -> DataFrame:
    """Video frame sampling. decode=False keeps the pure-Catalyst
    timestamp fan-out (one row per sampled ts). decode=True parses the
    Y4M payload and returns the REAL sampled frames' luma mean/std —
    per-payload decode inside mapInPandas, one pass per video row."""
    v = media.where(F.col("media_type") == "video")
    if not decode:
        return v.select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("ts_ms"),
        )

    def sample(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                frames, fps = decode_y4m(bytes(r.payload))
                dur_ms = len(frames) * 1000 // max(fps, 1)
                for ts in range(0, max(dur_ms, 1), every_ms):
                    fi = min(ts * fps // 1000, len(frames) - 1)
                    if fi < 0:
                        continue
                    fr = frames[fi].astype(np.float64)
                    rows.append(
                        {
                            "doc_id": int(r.doc_id),
                            "ts_ms": ts,
                            "frame_idx": int(fi),
                            "mean_px": float(fr.mean()),
                            "std_px": float(fr.std()),
                        }
                    )
            yield pd.DataFrame(rows)

    return v.select("doc_id", "payload").mapInPandas(
        sample,
        schema="doc_id long, ts_ms long, frame_idx int, "
        "mean_px double, std_px double",
    )
