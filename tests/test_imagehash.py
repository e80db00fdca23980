from __future__ import annotations

import itertools

import numpy as np
import pytest

from geoharvest_spark.imagehash import (
    dhash64,
    dhash_near_dups,
    synth_dhash_media_df,
    synth_dhash_media_pdf,
    with_image_dhash,
)
from geoharvest_spark.multimodal import _sniff_decode_image


def test_dhash_known_value():
    # 2x3 gray grid, grid=2 -> 4 bits MSB-first:
    #   row0: 5>3 -> 1, 3>9 -> 0 ; row1: 1>1 -> 0, 1>2 -> 0  => 0b1000
    img = np.array([[5, 3, 9], [1, 1, 2]], dtype=np.uint8)
    assert dhash64(img, grid=2) == 0b1000
    # strictness: equal neighbors are 0-bits (the PNG/PPM twin depends on it)
    flat = np.full((2, 3), 7, dtype=np.uint8)
    assert dhash64(flat, grid=2) == 0


def test_dhash_rgb_matches_gray():
    # gray-encoded RGB (r=g=b=v) must hash identically to the 2-D plane:
    # integer luma of (v,v,v) is exactly v
    rs = np.random.RandomState(7)
    plane = rs.randint(0, 256, size=(24, 27), dtype=np.uint8)
    rgb = np.stack([plane, plane, plane], axis=2)
    assert dhash64(rgb) == dhash64(plane)


def _brute_pairs(pdf):
    hs = {}
    for mid, kind, p in zip(pdf.media_id, pdf.kind, pdf.payload):
        if kind != "image":
            continue
        try:
            img = _sniff_decode_image(bytes(p))
        except ValueError:
            img = None
        if img is not None:
            hs[mid] = dhash64(img)
    out = set()
    for a, b in itertools.combinations(sorted(hs), 2):
        ham = bin((hs[a] ^ hs[b]) & (2**64 - 1)).count("1")
        if ham <= 3:
            out.add((a, b, ham))
    return out


def test_planted_pairs_and_divert(spark):
    df = synth_dhash_media_df(spark)
    hashed = with_image_dhash(df).cache()
    try:
        # divert contract: audio + undecodable image rows -> NULL dhash
        nulls = {
            r["media_id"]
            for r in hashed.where("dhash is null").select("media_id").collect()
        }
        assert nulls == {"aud0000", "bad0000"}

        got = {
            (r["id_a"], r["id_b"], r["hamming"])
            for r in dhash_near_dups(hashed).collect()
        }
        # recall proof: band-bucketed join == brute-force all-pairs
        assert got == _brute_pairs(synth_dhash_media_pdf())
        # planted structure: 8 cross-format exact dups + 8 two-bit near dups
        assert sum(1 for _, b, h in got if b.endswith("x") and h == 0) == 8
        assert sum(1 for _, b, h in got if b.endswith("n") and h == 2) == 8
        assert len(got) == 16
    finally:
        hashed.unpersist()


def test_max_hamming_validation(spark):
    df = synth_dhash_media_df(spark, n_base=3)
    with pytest.raises(ValueError, match="max_hamming"):
        dhash_near_dups(with_image_dhash(df), max_hamming=4)
