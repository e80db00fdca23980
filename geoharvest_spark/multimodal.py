"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features behind an import-try; a clearly-marked
NotImplementedError for real codec paths) — but the Spark-side plumbing is
real and tested: schema, Arrow batch shape, mapInPandas signatures,
partitioning, and the feature pipeline around the stub.

At 100 TB the pattern is: binary column scans stay columnar (parquet reads
only the projected struct fields), decode/resize/frame-sample run as
mapInPandas over bounded Arrow batches (maxRecordsPerBatch keeps executor
memory flat), features land in fixed-width array<float> columns for the
simsearch operators.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover — not installed in this container
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except Exception:
    Image = None
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 64


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a codec+encoder: md5-seeded pseudo-features.

    Used ONLY where a real decoder is unavailable (compressed formats —
    PIL/librosa/ffmpeg are absent in this container). WAV audio and PPM
    images decode for real below.
    """
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rs = np.random.RandomState(seed)
    return rs.normal(size=dim).astype(np.float32).tolist()


# ---------------------------------------------------------------------------
# REAL decoders (stdlib/numpy only — no wheels required)
# ---------------------------------------------------------------------------
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode via stdlib `wave`: (mono float64 in [-1,1], rate)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * width}-bit PCM not supported")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def wav_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real audio features: 60 windowed RMS energies + duration, rate,
    peak, zero-crossing rate. Fixed `dim`, deterministic."""
    x, rate = decode_wav(payload)
    n_windows = dim - 4
    if len(x) == 0:
        rms = np.zeros(n_windows)
        peak = zcr = dur = 0.0
    else:
        edges = np.linspace(0, len(x), n_windows + 1).astype(int)
        rms = np.array(
            [
                np.sqrt(np.mean(x[a:b] ** 2)) if b > a else 0.0
                for a, b in zip(edges[:-1], edges[1:])
            ]
        )
        peak = float(np.abs(x).max())
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8)))))
        dur = len(x) / rate
    out = np.concatenate([rms, [dur, rate / 48000.0, peak, zcr]])
    return out.astype(np.float32).tolist()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) decode — pure numpy: (h, w, 3) uint8."""
    if not payload.startswith(b"P6"):
        raise NotImplementedError("only binary PPM (P6) images decode here")
    # header: P6 <w> <h> <maxval> with arbitrary whitespace/comments
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        tokens.append(payload[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise NotImplementedError("only maxval 255 PPM supported")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=i)
    return arr.reshape(h, w, 3)


def ppm_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features: 16-bin luminance histogram + per-channel mean
    and std + normalized w/h, zero-padded to `dim`."""
    img = decode_ppm(payload).astype(np.float64)
    h, w, _ = img.shape
    lum = img @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(lum, bins=16, range=(0, 256))
    hist = hist / lum.size
    means = img.reshape(-1, 3).mean(axis=0) / 255.0
    stds = img.reshape(-1, 3).std(axis=0) / 255.0
    core = np.concatenate([hist, means, stds, [w / 4096.0, h / 4096.0]])
    out = np.zeros(dim)
    out[: len(core)] = core
    return out.astype(np.float32).tolist()


def decode_features(
    kind: str | None, payload: bytes | None, dim: int = FEATURE_DIM
) -> list[float]:
    """Dispatch: REAL decode for WAV audio and PPM images; deterministic
    stub for formats whose codecs are absent in this container."""
    if payload:
        if kind == "audio" and payload[:4] == b"RIFF":
            return wav_features(payload, dim)
        if kind == "image" and payload[:2] == b"P6":
            return ppm_features(payload, dim)
    return _fake_decode_features(payload, dim)


def decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Compressed image decode — requires a codec library (PPM decodes via
    decode_ppm without one)."""
    if not HAVE_PIL:
        raise NotImplementedError(
            "image decode requires PIL/pillow, not present in this container"
        )
    import io

    return np.asarray(Image.open(io.BytesIO(payload)))


def with_media_features(
    df: DataFrame, payload_col: str = "payload", dim: int = FEATURE_DIM
) -> DataFrame:
    """Add a fixed-width feature vector per media row (Arrow-batched).

    The batch shape is the contract: one mapInPandas pass, payloads decoded
    once, output column is array<float> of constant dim (validated in
    tests so the stub and a real encoder are interchangeable).
    """
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(fields + [f"features array<float>"])

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["features"] = [
                decode_features(k, p, dim)
                for k, p in zip(pdf["kind"], pdf[payload_col])
            ]
            yield pdf

    return df.mapInPandas(_map, schema)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plumbing: one row per planned frame timestamp
    (posexplode over a JVM-computed sequence; the actual frame extraction is
    the stubbed decode). Partitioning: repartition by media_id so one
    worker holds one video's frames contiguously."""
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int"), F.lit(1)
    )
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (n_frames - 1) * F.lit(every_ms),
                    F.lit(every_ms),
                )
            ),
        )
        .repartition(F.col("media_id"))
    )


def synth_wav(i: int, seconds: float = 0.2, rate: int = 8000) -> bytes:
    """Deterministic 16-bit mono PCM WAV (stdlib wave — a REAL wav file)."""
    import io
    import wave

    t = np.arange(int(seconds * rate)) / rate
    freq = 220.0 + 55.0 * (i % 8)
    rs = np.random.RandomState(1000 + i)
    x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.1 * rs.standard_normal(len(t))
    pcm = np.clip(x * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_ppm(i: int, w: int = 32, h: int = 24) -> bytes:
    """Deterministic binary PPM (P6) image — a REAL decodable image."""
    rs = np.random.RandomState(2000 + i)
    img = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def synth_media_pdf(n: int = 50) -> pd.DataFrame:
    """Deterministic media rows (pandas) — shared by the Spark table builder
    and the driver-side oracle staging path. Audio rows are REAL WAVs and
    image rows REAL PPMs (both decode without codec wheels); video payloads
    are opaque bytes exercising the stubbed path."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "audio":
            payload = synth_wav(i)
        elif kind == "image":
            payload = synth_ppm(i)
        else:
            payload = hashlib.md5(f"media{i}".encode()).digest() * 8
        rows.append(
            {
                "media_id": f"m{i:04d}",
                "kind": kind,
                "payload": payload,
                "meta": {
                    "width": 640 if kind == "image" else None,
                    "height": 480 if kind == "image" else None,
                    "duration_ms": 5000 + 1000 * (i % 7) if kind != "image" else None,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                },
            }
        )
    return pd.DataFrame(rows)


def synth_media_df(spark, n: int = 50) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return spark.createDataFrame(synth_media_pdf(n), schema=MEDIA_SCHEMA)
