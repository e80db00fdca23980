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

    Real path (PIL/librosa/ffmpeg) is NOT available in this container; when
    a codec import succeeds the real branch takes over.
    """
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rs = np.random.RandomState(seed)
    return rs.normal(size=dim).astype(np.float32).tolist()


def decode_image(payload: bytes) -> np.ndarray:  # pragma: no cover
    """Real image decode — requires a codec library."""
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
                _fake_decode_features(p, dim) for p in pdf[payload_col]
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


def synth_media_pdf(n: int = 50) -> pd.DataFrame:
    """Deterministic fake media rows (pandas) — shared by the Spark table
    builder and the driver-side oracle staging path."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
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
