"""Real multimodal decode paths: WAV / netpbm / Y4M codec round-trips,
DSP feature correctness on planted signals, and real keyframe sampling.
No media libraries required — these containers are self-describing."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrier_ef_spark.pipeline.multimodal import (
    AUDIO_RATE,
    VIDEO_FPS,
    audio_features,
    decode_netpbm,
    decode_wav,
    decode_y4m,
    encode_pgm,
    encode_wav,
    encode_y4m,
    extract_features,
    frame_sample,
    synthesize_media,
)


def test_wav_roundtrip_and_variants():
    rng = np.random.default_rng(11)
    samples = rng.integers(-30000, 30000, 500).astype(np.int16)
    back, rate = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000 and (back == samples).all()
    # stereo averages to mono
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        inter = np.empty(200, dtype="<i2")
        inter[0::2] = 1000
        inter[1::2] = 3000
        w.writeframes(inter.tobytes())
    mono, _ = decode_wav(buf.getvalue())
    assert (mono == 2000).all()
    # 8-bit unsigned PCM path
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([128, 255, 0]))
    s8, _ = decode_wav(buf.getvalue())
    assert s8.tolist() == [0, 127 << 8, -128 << 8]


def test_netpbm_decode_p5_p6_and_comments():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    assert (decode_netpbm(encode_pgm(img)) == img).all()
    # header comments are skipped (netpbm spec)
    commented = b"P5\n# a comment\n13 9\n# more\n255\n" + img.tobytes()
    assert (decode_netpbm(commented) == img).all()
    # P6 RGB reduces by BT.601 luma
    rgb = rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8)
    p6 = b"P6\n5 4\n255\n" + rgb.tobytes()
    want = (
        0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    ).astype(np.uint8)
    assert (decode_netpbm(p6) == want).all()
    with pytest.raises(ValueError, match="netpbm"):
        decode_netpbm(b"GIF89a...")


def test_y4m_roundtrip():
    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(5, 24, 32), dtype=np.uint8)
    back, fps = decode_y4m(encode_y4m(frames, fps=25))
    assert fps == 25 and (back == frames).all()
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFFnotavideo")


def test_audio_features_planted_sine(spark):
    """A pure 440 Hz tone: spectral centroid lands on the tone, ZCR is
    2f/rate, duration is exact — real DSP, not plumbing."""
    rate, dur_s, freq = AUDIO_RATE, 0.5, 440
    t = np.arange(int(rate * dur_s)) / rate
    tone = (0.8 * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    media = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(tone, rate)), 0, 0, 500)],
        "doc_id long, media_type string, payload binary, width int,"
        " height int, duration_ms int",
    )
    row = audio_features(media).collect()[0]
    assert row["sample_rate"] == rate
    assert abs(row["duration_s"] - dur_s) < 1e-9
    assert abs(row["spectral_centroid_hz"] - freq) < 25
    assert abs(row["zcr"] - 2 * freq / rate) < 0.01
    assert row["rms"] == pytest.approx(0.8 * 32767 / np.sqrt(2), rel=0.01)


def test_frame_sample_decodes_real_frames(spark):
    rng = np.random.default_rng(14)
    frames = rng.integers(0, 256, size=(6, 16, 16), dtype=np.uint8)
    media = spark.createDataFrame(
        [(7, "video", bytearray(encode_y4m(frames, fps=VIDEO_FPS)), 16, 16,
          6 * 1000 // VIDEO_FPS)],
        "doc_id long, media_type string, payload binary, width int,"
        " height int, duration_ms int",
    )
    got = {r["ts_ms"]: r for r in
           frame_sample(media, every_ms=200, decode=True).collect()}
    assert got, "no frames sampled"
    for ts, r in got.items():
        fi = min(ts * VIDEO_FPS // 1000, 5)
        assert r["frame_idx"] == fi
        assert r["mean_px"] == pytest.approx(frames[fi].mean())
    # the pure-Catalyst fan-out agrees on the sampled timestamps
    plan = {r["ts_ms"] for r in frame_sample(media, every_ms=200).collect()}
    assert plan == set(got)


def test_synthesized_media_decodes_for_all_modalities(spark):
    """The fixture emits VALID containers: every payload parses with
    the matching real decoder and metadata matches the actual bytes."""
    docs = spark.createDataFrame(
        [(i, f"doc number {i} text") for i in range(9)],
        "doc_id long, text string",
    )
    rows = synthesize_media(docs).collect()
    assert len(rows) == 9
    for r in rows:
        payload = bytes(r["payload"])
        if r["media_type"] == "image":
            img = decode_netpbm(payload)
            assert img.shape == (r["height"], r["width"])
        elif r["media_type"] == "audio":
            samples, rate = decode_wav(payload)
            assert rate == AUDIO_RATE
            assert len(samples) == AUDIO_RATE * r["duration_ms"] // 1000
        else:
            frames, fps = decode_y4m(payload)
            assert fps == VIDEO_FPS
            assert len(frames) * 1000 // fps == r["duration_ms"]
    # features are real: an image doc's mean matches the decoded pixels
    img_row = next(r for r in rows if r["media_type"] == "image")
    img = decode_netpbm(bytes(img_row["payload"]))
    ys = np.arange(8) * img.shape[0] // 8
    xs = np.arange(8) * img.shape[1] // 8
    want_mean = img[np.ix_(ys, xs)].astype(np.float64).mean()
    media = synthesize_media(docs)
    feats = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert feats[img_row["doc_id"]]["mean_px"] == pytest.approx(want_mean)
    # determinism across runs (seeded from text)
    again = {r["doc_id"]: r for r in extract_features(media).collect()}
    assert all(feats[k]["mean_px"] == again[k]["mean_px"] for k in feats)
