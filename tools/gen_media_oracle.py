"""Generate pinned-literal DuckDB VALUES oracles for the two media
contract keys (media_audio_features / media_frame_stats) — the
test_weighting_pinned.py discipline applied to the driver gate: the
FIXTURE (synthesize_media payloads, deterministic functions of the
documents table) is shared, but decode + DSP here are INDEPENDENT of
terrier_ef_spark.pipeline.multimodal:

- WAV is parsed with the Python stdlib `wave` module (vs the repo's
  hand-rolled RIFF chunk walker);
- Y4M is parsed with a from-scratch header/FRAME splitter written
  against the public Y4M spec;
- RMS / ZCR / spectral centroid / luma stats are recomputed here from
  first principles.

Rounding emulates Spark's HALF_UP (decimal.Decimal), matching the
F.round calls in the contract queries. Output is pinned to ONE sf dir
(the driver's sf0.01) and written to terrier_ef_spark/media_oracle.py.

Usage: python tools/gen_media_oracle.py [sf_dir] [out_py]
"""

from __future__ import annotations

import io
import sys
import wave
from decimal import ROUND_HALF_UP, Decimal

import numpy as np

sys.path.insert(0, ".")


def round_half_up(x: float, nd: int) -> float:
    return float(Decimal(repr(x)).quantize(Decimal(1).scaleb(-nd),
                                            rounding=ROUND_HALF_UP))


def parse_wav_stdlib(payload: bytes) -> tuple[np.ndarray, int]:
    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("oracle fixture expects 16-bit mono PCM")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2"), rate


def parse_y4m(payload: bytes) -> tuple[np.ndarray, int]:
    """From-scratch YUV4MPEG2 parser (header + FRAME markers, C420
    planar): returns (luma frames [n,h,w], fps)."""
    nl = payload.index(b"\n")
    header = payload[:nl].decode("ascii")
    fields = header.split(" ")
    if fields[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M stream")
    w = h = fps_num = fps_den = None
    for f in fields[1:]:
        if f.startswith("W"):
            w = int(f[1:])
        elif f.startswith("H"):
            h = int(f[1:])
        elif f.startswith("F"):
            fps_num, fps_den = (int(x) for x in f[1:].split(":"))
    if not (w and h and fps_num):
        raise ValueError("incomplete Y4M header")
    fps = fps_num // fps_den
    frame_bytes = w * h + 2 * ((w // 2) * (h // 2))  # C420 default
    pos, frames = nl + 1, []
    while pos < len(payload):
        fe = payload.index(b"\n", pos)
        if not payload[pos:fe].startswith(b"FRAME"):
            raise ValueError("missing FRAME marker")
        pos = fe + 1
        luma = np.frombuffer(payload[pos:pos + w * h], dtype=np.uint8)
        frames.append(luma.reshape(h, w))
        pos += frame_bytes
    return np.stack(frames), fps


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_py = (
        sys.argv[2] if len(sys.argv) > 2
        else "terrier_ef_spark/media_oracle.py"
    )

    from terrier_ef_spark.pipeline.multimodal import synthesize_media
    from terrier_ef_spark.session import get_spark

    spark = get_spark("gen-media-oracle")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = synthesize_media(docs).collect()

    audio_rows = []
    frame_rows = []
    for r in sorted(media, key=lambda r: r["doc_id"]):
        if r["media_type"] == "audio":
            x, rate = parse_wav_stdlib(bytes(r["payload"]))
            xf = x.astype(np.float64)
            n = len(xf)
            rms = float(np.sqrt(np.mean(xf**2))) if n else 0.0
            zcr = (
                float(np.mean(np.signbit(xf[1:]) != np.signbit(xf[:-1])))
                if n else 0.0
            )
            if n:
                spec = np.abs(np.fft.rfft(xf))
                freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                den = spec.sum()
                cen = float((freqs * spec).sum() / den) if den else 0.0
            else:
                cen = 0.0
            audio_rows.append((
                int(r["doc_id"]), int(rate),
                round_half_up(n / rate, 4), round_half_up(rms, 2),
                round_half_up(zcr, 4), round_half_up(cen, 1),
            ))
        elif r["media_type"] == "video":
            frames, fps = parse_y4m(bytes(r["payload"]))
            dur_ms = len(frames) * 1000 // max(fps, 1)
            for ts in range(0, max(dur_ms, 1), 100):
                fi = min(ts * fps // 1000, len(frames) - 1)
                fr = frames[fi].astype(np.float64)
                frame_rows.append((
                    int(r["doc_id"]), int(ts), int(fi),
                    round_half_up(float(fr.mean()), 2),
                    round_half_up(float(fr.std()), 2),
                ))

    def values_sql(rows, cols, types):
        body = ",\n".join(
            "(" + ", ".join(repr(v) for v in row) + ")" for row in rows
        )
        sel = ", ".join(
            f"CAST({c} AS {t}) AS {c}" for c, t in zip(cols, types)
        )
        return (
            f"SELECT {sel} FROM (VALUES\n{body}\n) AS t({', '.join(cols)})"
        )

    audio_sql = values_sql(
        audio_rows,
        ["doc_id", "sample_rate", "duration_s", "rms", "zcr",
         "spectral_centroid_hz"],
        ["BIGINT", "INTEGER", "DOUBLE", "DOUBLE", "DOUBLE", "DOUBLE"],
    )
    frame_sql = values_sql(
        frame_rows,
        ["doc_id", "ts_ms", "frame_idx", "mean_px", "std_px"],
        ["BIGINT", "BIGINT", "INTEGER", "DOUBLE", "DOUBLE"],
    )

    with open(out_py, "w") as fh:
        fh.write(
            '"""AUTO-GENERATED by tools/gen_media_oracle.py — pinned-\n'
            "literal DuckDB oracles for the two media contract keys,\n"
            f"computed by an independent decoder over the deterministic\n"
            f"sf fixture at {sf_dir} (see the generator's docstring for\n"
            'the clean-room boundary). Regenerate after any fixture\n'
            'change."""\n\n'
            f"PINNED_SF_DIR = {sf_dir!r}\n\n"
            f"MEDIA_AUDIO_FEATURES_SQL = '''{audio_sql}'''\n\n"
            f"MEDIA_FRAME_STATS_SQL = '''{frame_sql}'''\n"
        )
    print(f"wrote {out_py}: {len(audio_rows)} audio rows, "
          f"{len(frame_rows)} frame rows")


if __name__ == "__main__":
    main()
