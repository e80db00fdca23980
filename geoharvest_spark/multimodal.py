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


def _image_features(img: np.ndarray, dim: int = FEATURE_DIM) -> list[float]:
    """Shared pixel-array features: 16-bin luminance histogram +
    per-channel mean/std + normalized w/h, zero-padded to `dim`.
    Accepts (h, w), (h, w, 1), (h, w, 3) or (h, w, 4) uint8 arrays
    (gray replicated to RGB; alpha dropped)."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 1:
        img = np.repeat(img, 3, axis=2)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    if img.dtype == np.uint16:  # 16-bit samples -> 0..255 domain
        img = img.astype(np.float64) / 257.0
    img = img.astype(np.float64)
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


def ppm_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features over a decoded PPM."""
    return _image_features(decode_ppm(payload), dim)


# PNG color type -> samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 interlace passes: (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(rows: np.ndarray, filters: np.ndarray, bpp: int) -> np.ndarray:
    """Reconstruct (h, stride) scanline BYTES from filtered rows — the
    five PNG filters; stride/bpp are in bytes so 8- and 16-bit share it."""
    h, stride = rows.shape
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(filters[y])
        r = rows[y]
        if f == 0:  # None
            rec = r & 0xFF
        elif f == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] — cumsum per lane
            rec = (np.cumsum(r.reshape(-1, bpp), axis=0) & 0xFF).reshape(-1)
        elif f == 2:  # Up
            rec = (r + prev) & 0xFF
        elif f == 3:  # Average (sequential left-dependency)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (r[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth (sequential left-dependency)
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (r[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decode (zlib inflate + per-scanline unfilter +
    numpy): supports 8- and 16-bit non-interlaced grayscale (0), RGB (2),
    8-bit palette (3), gray+alpha (4) and RGBA (6). Returns
    (h, w, channels) uint8 or uint16 (big-endian samples per the spec).
    PNG filters operate on BYTES with a bpp stride of channels*depth/8,
    so the same unfilter kernel covers both depths; Adam7 interlacing is
    handled as 7 independently-filtered sub-images scattered onto the
    canvas. Sub-byte depths raise NotImplementedError (JPEG-stub style)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG signature")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth not in (8, 16) or (depth == 16 and color == 3):
        raise NotImplementedError(f"{depth}-bit color-type-{color} PNG not supported")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace {interlace}")
    if color not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    ch = _PNG_CHANNELS[color]
    bpp = ch * (depth // 8)  # filter stride is in BYTES per pixel
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    canvas = np.zeros((h, w, bpp), dtype=np.uint8)
    passes = (
        [(0, 0, 1, 1)] if interlace == 0 else list(_ADAM7)
    )
    pos = 0
    for x0, y0, dx, dy in passes:
        wp = max(0, -(-(w - x0) // dx))  # ceil((w - x0) / dx)
        hp = max(0, -(-(h - y0) // dy))
        if wp == 0 or hp == 0:
            continue  # empty pass contributes no scanlines at all
        stride = wp * bpp
        need = hp * (stride + 1)
        if pos + need > len(raw):
            raise ValueError("PNG data length mismatch")
        block = raw[pos : pos + need].reshape(hp, stride + 1)
        pos += need
        rec = _png_unfilter(block[:, 1:].astype(np.int32), block[:, 0], bpp)
        canvas[y0:h:dy, x0:w:dx] = rec.reshape(hp, wp, bpp)
    if pos != len(raw):
        raise ValueError("PNG data length mismatch")
    if depth == 16:  # big-endian sample pairs per the spec
        img = (
            canvas.reshape(h, w, ch, 2).astype(np.uint16)[:, :, :, 0] * 256
            + canvas.reshape(h, w, ch, 2)[:, :, :, 1]
        ).astype(np.uint16)
    else:
        img = canvas.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def png_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real image features over a decoded PNG."""
    return _image_features(decode_png(payload), dim)


def _png_filter_rows(
    flat: np.ndarray, bpp: int, filters: list[int] | None
) -> bytearray:
    """Apply PNG filters to (h, stride) scanline BYTES; cycles `filters`."""
    lines = bytearray()
    prev = np.zeros(flat.shape[1], dtype=np.int32)
    for y in range(flat.shape[0]):
        f = filters[y % len(filters)] if filters else 0
        r = flat[y]
        if f == 0:
            enc = r
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), r[:-bpp]])
            enc = (r - left) & 0xFF
        elif f == 2:
            enc = (r - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), r[:-bpp]])
            enc = (r - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            left = np.concatenate([np.zeros(bpp, dtype=np.int32), r[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            enc = (r - pred) & 0xFF
        else:
            raise ValueError(f"bad filter {f}")
        lines.append(f)
        lines.extend(enc.astype(np.uint8).tobytes())
        prev = r
    return lines


def encode_png(
    img: np.ndarray,
    filters: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal PNG encoder (stdlib struct+zlib): 8-bit (uint8) or 16-bit
    (uint16, big-endian samples) gray/RGB/RGBA, optionally Adam7
    interlaced. `filters` optionally forces a filter type per row
    (cycling) so tests can exercise every unfilter path; default None."""
    import struct
    import zlib

    img = np.asarray(img)
    depth = 16 if img.dtype == np.uint16 else 8
    img = img.astype(">u2") if depth == 16 else img.astype(np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    bpp = ch * (depth // 8)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    # filters run over BYTES (bpp stride), identical for 8/16-bit
    canvas = img.reshape(h, w * ch).view(np.uint8).reshape(h, w, bpp)
    lines = bytearray()
    passes = list(_ADAM7) if interlace else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        sub = canvas[y0:h:dy, x0:w:dx]
        hp, wp = sub.shape[0], sub.shape[1]
        if hp == 0 or wp == 0:
            continue
        lines.extend(
            _png_filter_rows(
                sub.reshape(hp, wp * bpp).astype(np.int32), bpp, filters
            )
        )
    ihdr = struct.pack(
        ">IIBBBBB", w, h, depth, color, 0, 0, 1 if interlace else 0
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


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
        if kind == "image" and payload[:8] == b"\x89PNG\r\n\x1a\n":
            return png_features(payload, dim)
    return _fake_decode_features(payload, dim)


def decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Other compressed image formats (JPEG, WebP, ...) — require a codec
    library. PPM decodes via decode_ppm and PNG via decode_png with no
    codec wheels."""
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


def resize_image(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (numpy index mapping —
    src index = floor(dst * src/dst), the classic NN rule)."""
    img = np.asarray(img)
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]


def with_resized_images(
    df: DataFrame,
    out_h: int = 12,
    out_w: int = 16,
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize as a mapInPandas stage: decodable image payloads
    (PPM/PNG) are decoded, nearest-neighbor resized and re-encoded as
    PNG; non-images and undecodable payloads pass through with a null
    resized column. Output adds (resized: binary, out_w: int, out_h: int).
    """
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(fields + ["resized binary", "out_w int", "out_h int"])

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for kind, payload in zip(pdf["kind"], pdf[payload_col]):
                img = None
                if kind == "image" and payload:
                    p = bytes(payload)
                    try:
                        if p[:2] == b"P6":
                            img = decode_ppm(p)
                        elif p[:8] == b"\x89PNG\r\n\x1a\n":
                            img = decode_png(p)
                    except (ValueError, NotImplementedError):
                        img = None  # undecodable -> pass-through row
                if img is None:
                    out.append((None, None, None))
                else:
                    out.append(
                        (encode_png(resize_image(img, out_h, out_w)), out_w, out_h)
                    )
            pdf["resized"] = [o[0] for o in out]
            pdf["out_w"] = pd.array([o[1] for o in out], dtype="Int32")
            pdf["out_h"] = pd.array([o[2] for o in out], dtype="Int32")
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


def synth_png(i: int, w: int = 32, h: int = 24) -> bytes:
    """Deterministic PNG — a REAL compressed image, encoded with cycling
    scanline filters so decoding exercises every unfilter path."""
    rs = np.random.RandomState(3000 + i)
    img = rs.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return encode_png(img, filters=[0, 1, 2, 3, 4])


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
            # alternate REAL PPM and REAL PNG payloads: both decode
            # without codec wheels, so the image column runs end-to-end
            payload = synth_ppm(i) if (i // 3) % 2 == 0 else synth_png(i)
        else:
            payload = hashlib.md5(f"media{i}".encode()).digest() * 8
        is_png = kind == "image" and (i // 3) % 2 == 1
        rows.append(
            {
                "media_id": f"m{i:04d}",
                "kind": kind,
                "payload": payload,
                "meta": {
                    "width": 640 if kind == "image" else None,
                    "height": 480 if kind == "image" else None,
                    "duration_ms": 5000 + 1000 * (i % 7) if kind != "image" else None,
                    "mime": {
                        "image": "image/png" if is_png else "image/x-portable-pixmap",
                        "audio": "audio/wav",
                        "video": "video/mp4",
                    }[kind],
                },
            }
        )
    return pd.DataFrame(rows)


def synth_media_df(spark, n: int = 50) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return spark.createDataFrame(synth_media_pdf(n), schema=MEDIA_SCHEMA)
