"""Perceptual image hashing and image near-duplicate detection.

The LLM-pipeline multimodal gap-closer: dHash (difference hash — the
public gradient-hash algorithm, Krawetz 2013) over the engine's own
pure-numpy decoders, then the SimHash banding machinery for the
near-dup join. A training-data pipeline dedupes images the same way it
dedupes text: hash -> band-bucket candidates -> exact Hamming filter —
never an all-pairs pixel comparison.

Pipeline shape (all distributed, decode stays in Arrow batches):

  with_image_dhash   mapInPandas: payload -> decode -> integer luma ->
                     8x9 NN downsample -> 64 horizontal-gradient bits
                     (one pass, same batch contract as with_media_features)
  dhash_near_dups    4x16-bit chunk banding + bit_count(xor) exact
                     filter (pigeonhole: Hamming<=3 of 64 bits forces
                     >=1 equal chunk) — the image twin of
                     textops.simhash_near_dups

Determinism: luma is integer ((299r+587g+114b)//1000), the downsample
is the closed-form NN index rule (multimodal.resize_image), and the
bits are strict `left > right` comparisons — bit-identical on any
executor, so the DuckDB oracle can rebuild the hash, the banding and
the join from staged downsample pixels and must match exactly.

The reference (MITLibraries/geo-harvester) has no image dedup; this
extends the beyond-reference multimodal family (COVERAGE.md).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import _sniff_decode_image, resize_image

# dHash geometry: G rows x (G+1) cols of luma, G bits per row.
DHASH_GRID = 8


def gray_luma(img: np.ndarray) -> np.ndarray:
    """Integer Rec.601-weight luma (floor division — no float rounding).

    Grayscale inputs pass through; RGBA alpha is ignored (the hash is
    about content, and the decoders emit opaque alpha for synth data).
    """
    img = np.asarray(img)
    if img.ndim == 2:
        return img.astype(np.int64)
    r = img[..., 0].astype(np.int64)
    g = img[..., 1].astype(np.int64)
    b = img[..., 2].astype(np.int64)
    return (299 * r + 587 * g + 114 * b) // 1000


def dhash_pixels(img: np.ndarray, grid: int = DHASH_GRID) -> np.ndarray:
    """The grid x (grid+1) luma downsample the hash is built from."""
    return resize_image(gray_luma(img), grid, grid + 1)


def dhash64(img: np.ndarray, grid: int = DHASH_GRID) -> int:
    """64-bit difference hash as a SIGNED int64 (two's complement, the
    Spark/parquet BIGINT representation). Bit (row*grid + col), MSB
    first: 1 iff luma[row, col] > luma[row, col+1]."""
    px = dhash_pixels(img, grid)
    bits = (px[:, :-1] > px[:, 1:]).astype(np.uint64).ravel()
    h = np.uint64(0)
    for bit in bits:
        h = (h << np.uint64(1)) | bit
    return int(h.view(np.int64))


def with_image_dhash(
    df: DataFrame,
    payload_col: str = "payload",
    kind_col: str = "kind",
) -> DataFrame:
    """Add `dhash bigint` per row (Arrow-batched, one decode pass).

    Non-image rows and undecodable payloads get NULL — divert, don't
    crash, the same boundary contract as with_resized_images.
    """
    fields = [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
    schema = ", ".join(fields + ["dhash bigint"])

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            out = []
            for kind, payload in zip(pdf[kind_col], pdf[payload_col]):
                h = None
                if kind == "image" and payload is not None:
                    try:
                        img = _sniff_decode_image(bytes(payload))
                        if img is not None:
                            h = dhash64(img)
                    except (ValueError, NotImplementedError):
                        h = None
                out.append(h)
            pdf["dhash"] = pd.array(out, dtype="Int64")
            yield pdf

    return df.mapInPandas(_map, schema)


def dhash_near_dups(
    hashed: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 3,
) -> DataFrame:
    """Image near-dup pairs: 4x16-bit chunk banding + exact Hamming.

    A pair within Hamming<=3 of 64 bits must agree on >=1 of the 4
    chunks (pigeonhole), so candidates meet in a chunk-value bucket —
    shuffle cost O(rows * 4), never O(n^2). bit_count(xor) then filters
    exactly; banding only affects WHICH pairs are examined, never the
    verdict, so recall is provably 1.0 for max_hamming<=3.

    Returns (id_a, id_b, hamming) with id_a < id_b, each pair once.
    """
    if not 0 <= max_hamming <= 3:
        raise ValueError(
            "4x16 banding guarantees recall only for max_hamming<=3; "
            f"got {max_hamming}"
        )
    # cache the (id, h) signatures — 16 bytes/row — because BOTH sides
    # of the band self-join scan them: without this the upstream DECODE
    # mapInPandas runs twice (measured: 2 MapInPandas stages, no
    # ReusedExchange), doubling the dominant cost at scale. Same
    # discipline as minhash_lsh_pairs' signature cache.
    sigs = (
        hashed.where(F.col(hash_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.col(hash_col).alias("h"))
        .cache()
    )
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("chunk"),
                F.shiftright("h", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("v"),
            )
            for i in range(4)
        ]
    )
    banded = sigs.withColumn("c", F.explode(chunks)).select(
        "id", "h", F.col("c.chunk").alias("chunk"), F.col("c.v").alias("v")
    )
    a = banded.select(F.col("id").alias("id_a"), F.col("h").alias("h_a"), "chunk", "v")
    b = banded.select(F.col("id").alias("id_b"), F.col("h").alias("h_b"), "chunk", "v")
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(b, ["chunk", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", ham)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def synth_dhash_media_pdf(n_base: int = 24) -> pd.DataFrame:
    """Deterministic media rows with PLANTED image duplicates (pandas —
    shared by the Spark builder and the oracle staging path).

    Base image i is a random 8x9 luma grid upscaled 3x to a 24x27 gray
    PPM, so the dHash downsample recovers the grid EXACTLY (24 and 27
    are multiples of the grid dims under the NN index rule) and every
    planted bit flip is closed-form:

      i % 3 == 0  ->  exact duplicate re-encoded as PNG (same pixels,
                      different container: cross-format, Hamming 0)
      i % 3 == 1  ->  near duplicate: column-0 cells of two rows nudged
                      across their right neighbor (each toggles exactly
                      one gradient bit -> Hamming 2)
      i % 3 == 2  ->  no twin (bases are random: expected pairwise
                      Hamming ~32, never within 3)

    Plus one audio row and one undecodable image row (divert contract).
    """
    from .multimodal import encode_png

    rows = []

    def _gray_ppm(grid: np.ndarray) -> bytes:
        img = np.repeat(np.repeat(grid, 3, axis=0), 3, axis=1).astype(np.uint8)
        rgb = np.stack([img, img, img], axis=2)
        return b"P6\n%d %d\n255\n" % (rgb.shape[1], rgb.shape[0]) + rgb.tobytes()

    def _gray_png(grid: np.ndarray) -> bytes:
        img = np.repeat(np.repeat(grid, 3, axis=0), 3, axis=1).astype(np.uint8)
        return encode_png(np.stack([img, img, img], axis=2))

    for i in range(n_base):
        grid = np.random.RandomState(4000 + i).randint(
            0, 256, size=(DHASH_GRID, DHASH_GRID + 1)
        )
        rows.append(
            {"media_id": f"img{i:04d}", "kind": "image", "payload": _gray_ppm(grid)}
        )
        if i % 3 == 0:
            rows.append(
                {
                    "media_id": f"img{i:04d}x",
                    "kind": "image",
                    "payload": _gray_png(grid),
                }
            )
        elif i % 3 == 1:
            g2 = grid.copy()
            for r in (i % DHASH_GRID, (i + 3) % DHASH_GRID):
                # toggle gradient bit (r, 0): move cell across its right
                # neighbor; col 0 has no left neighbor, so exactly one
                # bit flips per row touched
                if g2[r, 0] > g2[r, 1]:
                    g2[r, 0] = max(g2[r, 1] - 1, 0)
                    if g2[r, 1] == 0:
                        g2[r, 1] = 1  # keep the strict < relation
                else:
                    g2[r, 0] = min(g2[r, 1] + 1, 255)
                    if g2[r, 1] == 255:
                        g2[r, 1] = 254
            rows.append(
                {
                    "media_id": f"img{i:04d}n",
                    "kind": "image",
                    "payload": _gray_ppm(g2),
                }
            )
    rows.append({"media_id": "aud0000", "kind": "audio", "payload": b"RIFFnope"})
    rows.append({"media_id": "bad0000", "kind": "image", "payload": b"\x00notanimage"})
    return pd.DataFrame(rows)


def synth_dhash_media_df(spark, n_base: int = 24) -> DataFrame:
    return spark.createDataFrame(
        synth_dhash_media_pdf(n_base),
        schema="media_id string, kind string, payload binary",
    )
