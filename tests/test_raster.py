"""GeoTIFF-shaped raster path (round 5): TIFF codec round-trips,
PackBits, georeferencing tags, and the raster->vector cell aggregation
operator (partials inside the batch, two-stage merge)."""

from __future__ import annotations

import numpy as np
import pytest

from geoharvest_spark.index import ghcell_np
from geoharvest_spark.raster import (
    _packbits_decode,
    decode_tiff,
    encode_tiff,
    raster_cell_stats,
)


def test_tiff_roundtrip_rgb_gray_and_geo():
    rgb = (np.arange(20 * 24 * 3).reshape(20, 24, 3) % 256).astype(np.uint8)
    out, meta = decode_tiff(encode_tiff(rgb))
    assert np.array_equal(out[:, :, :3], rgb)
    assert "geotransform" not in meta
    g = (np.arange(10 * 13).reshape(10, 13) % 256).astype(np.uint8)
    out2, _ = decode_tiff(encode_tiff(g))
    assert np.array_equal(out2, g)
    out3, meta3 = decode_tiff(
        encode_tiff(rgb, pixel_scale=(0.05, 0.04), tiepoint=(-120.0, 45.0))
    )
    assert meta3["geotransform"] == (-120.0, 0.05, 45.0, 0.04)
    assert np.array_equal(out3[:, :, :3], rgb)


def test_tiff_big_endian_and_packbits():
    import struct

    # hand-build a minimal MM (big-endian) gray TIFF with PackBits rows
    h, w = 3, 5
    img = np.array(
        [[7, 7, 7, 7, 9], [1, 2, 3, 4, 5], [0, 0, 0, 0, 0]], dtype=np.uint8
    )
    # PackBits per full image (single strip): runs + literals
    pb = bytes(
        [257 - 4 & 0xFF, 7, 0, 9]  # 4x7, literal 9
        + [4, 1, 2, 3, 4, 5]       # 5 literals
        + [257 - 5 & 0xFF, 0]      # 5x0
    )
    entries = [
        (256, 3, 1, struct.pack(">HH", w, 0)),
        (257, 3, 1, struct.pack(">HH", h, 0)),
        (258, 3, 1, struct.pack(">HH", 8, 0)),
        (259, 3, 1, struct.pack(">HH", 32773, 0)),
        (262, 3, 1, struct.pack(">HH", 1, 0)),
        (273, 4, 1, None),  # patched
        (277, 3, 1, struct.pack(">HH", 1, 0)),
        (278, 4, 1, struct.pack(">I", h)),
        (279, 4, 1, struct.pack(">I", len(pb))),
    ]
    data_off = 8 + 2 + 12 * len(entries) + 4
    buf = bytearray(b"MM\x00*" + struct.pack(">I", 8))
    buf += struct.pack(">H", len(entries))
    for tag, typ, cnt, raw in entries:
        if raw is None:
            raw = struct.pack(">I", data_off)
        buf += struct.pack(">HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")[:4]
    buf += struct.pack(">I", 0)
    buf += pb
    out, meta = decode_tiff(bytes(buf))
    assert meta["compression"] == 32773
    assert np.array_equal(out, img)


def test_packbits_edge_cases():
    assert _packbits_decode(bytes([0, 42]), 1) == bytes([42])
    assert _packbits_decode(bytes([129, 9]), 128) == bytes([9] * 128)
    with pytest.raises(ValueError):
        _packbits_decode(bytes([4, 1, 2]), 5)  # literal run truncated


def test_tiff_malformed_and_gates():
    rgb = (np.arange(8 * 8 * 3).reshape(8, 8, 3) % 256).astype(np.uint8)
    good = encode_tiff(rgb)
    with pytest.raises(ValueError):
        decode_tiff(b"not a tiff")
    with pytest.raises(ValueError):
        decode_tiff(good[:40])
    with pytest.raises(ValueError):
        decode_tiff(good[:-50])
    # patch Compression (259): 5 (LZW), 7 (JPEG — implemented r6) and
    # 8 (Deflate) are implemented, so an UNrecompressed body mislabeled
    # with any of them must fail with a clean ValueError, not crash or
    # emit wrong pixels
    import struct as st

    n = st.unpack("<H", good[8:10])[0]

    def _patched(comp):
        b = bytearray(good)
        for i in range(n):
            o = 10 + 12 * i
            if st.unpack("<H", b[o : o + 2])[0] == 259:
                b[o + 8 : o + 10] = st.pack("<H", comp)
        return bytes(b)

    with pytest.raises(ValueError):
        decode_tiff(_patched(7))
    with pytest.raises(ValueError):
        decode_tiff(_patched(5))
    with pytest.raises(ValueError):
        decode_tiff(_patched(8))


def test_tiff_lzw_roundtrip_and_conformance():
    """TIFF 6.0 LZW: hand-packed spec fixture, early-change width
    boundaries (decoder widens at 510/1022/2046 — one earlier than the
    encoder's 511/1023/2047), table clears, and the horizontal
    predictor, through full encode_tiff/decode_tiff."""
    from geoharvest_spark.raster import _tiff_lzw_decode, _tiff_lzw_encode

    # hand trace of "ababab": Clear, 97 (+ab=258), 98 (+ba), 258 (+aba),
    # final run "ab" -> 258, EOI — all at 9 bits
    codes = [256, 97, 98, 258, 258, 257]
    bits = "".join(format(c, "09b") for c in codes)
    bits += "0" * ((8 - len(bits) % 8) % 8)
    ref = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    assert _tiff_lzw_encode(b"ababab") == ref
    assert _tiff_lzw_decode(ref, 6) == b"ababab"

    rng = np.random.default_rng(3)
    # alphabets sized to cross each width boundary and force table clears
    for n, alpha in ((50, 2), (5000, 4), (60000, 8), (200000, 256)):
        data = bytes(rng.integers(0, alpha, n).astype(np.uint8))
        assert _tiff_lzw_decode(_tiff_lzw_encode(data), n) == data

    for shape in ((23, 31), (17, 19, 3)):
        img = rng.integers(0, 256, shape).astype(np.uint8)
        for comp, pred in ((5, 1), (5, 2), (1, 2), (8, 1), (8, 2)):
            p = encode_tiff(
                img, pixel_scale=(0.5, 0.5), tiepoint=(-30.0, 10.0),
                compression=comp, predictor=pred,
            )
            out, meta = decode_tiff(p)
            assert (out == img).all()
            assert meta["compression"] == comp
            assert meta["geotransform"] is not None
    # predictor earns its keep on smooth gradients
    g = np.tile(np.arange(256, dtype=np.uint8), (64, 4))
    assert len(encode_tiff(g, compression=5, predictor=2)) < len(
        encode_tiff(g, compression=5)
    )


def test_raster_cell_stats_accepts_lzw_payloads(spark):
    """LZW+predictor GeoTIFFs flow through the distributed raster path
    identically to uncompressed ones."""
    from geoharvest_spark.raster import raster_cell_stats

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (12, 15)).astype(np.uint8)
    raw = encode_tiff(img, pixel_scale=(0.5, 0.5), tiepoint=(-10.0, 20.0))
    lzw = encode_tiff(
        img, pixel_scale=(0.5, 0.5), tiepoint=(-10.0, 20.0),
        compression=5, predictor=2,
    )
    a = raster_cell_stats(
        spark.createDataFrame([(0, raw)], "rid int, payload binary"), res=5
    ).toPandas().sort_values("cell").reset_index(drop=True)
    b = raster_cell_stats(
        spark.createDataFrame([(0, lzw)], "rid int, payload binary"), res=5
    ).toPandas().sort_values("cell").reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def test_raster_cell_stats_matches_numpy(spark):
    import pandas as pd

    rows = []
    expect: dict[int, tuple[int, int]] = {}
    for rid in range(4):
        h, w = 6 + rid, 9 + rid
        rr, cc = np.mgrid[0:h, 0:w]
        img = ((rr * 2 + cc + rid) % 100).astype(np.uint8)
        lon0, lat0 = -30.0 + rid * 3.25, 10.0 - rid * 2.5
        rows.append(
            (rid, encode_tiff(img, pixel_scale=(0.5, 0.5),
                              tiepoint=(lon0, lat0)))
        )
        lon = lon0 + (np.arange(w) + 0.5) * 0.5
        lat = lat0 - (np.arange(h) + 0.5) * 0.5
        cells = ghcell_np(
            np.broadcast_to(lon[None, :], (h, w)).reshape(-1),
            np.broadcast_to(lat[:, None], (h, w)).reshape(-1),
            5,
        )
        for c, v in zip(cells.tolist(), img.reshape(-1).tolist()):
            n, s = expect.get(c, (0, 0))
            expect[c] = (n + 1, s + v)
    # planted junk: undecodable + un-georeferenced must be skipped
    rows.append((90, b"junk"))
    rows.append((91, encode_tiff(np.zeros((4, 4), dtype=np.uint8))))
    df = spark.createDataFrame(rows, "rid int, payload binary")
    got = {
        r["cell"]: (r["n_pixels"], r["sum_val"])
        for r in raster_cell_stats(df, res=5).collect()
    }
    assert got == expect


def test_raster_tile_pyramid_equals_direct(spark):
    """Weighted pyramid rollup == direct per-level assignment (the
    aperture-4 floor-commute property, for raster sums)."""
    from geoharvest_spark.raster import raster_tile_pyramid

    rows = []
    for rid in range(3):
        h, w = 8, 11
        rr, cc = np.mgrid[0:h, 0:w]
        img = ((rr + cc * 3 + rid) % 97).astype(np.uint8)
        rows.append(
            (rid, encode_tiff(img, pixel_scale=(0.3, 0.25),
                              tiepoint=(-10.0 + rid * 7.0, 20.0)))
        )
    df = spark.createDataFrame(rows, "rid int, payload binary")
    fine = raster_cell_stats(df, res=7)
    pyr = {
        (r["res"], r["cell"]): (r["n_pixels"], r["sum_val"])
        for r in raster_tile_pyramid(fine, (5, 6, 7)).collect()
    }
    for res in (5, 6, 7):
        direct = {
            (res, r["cell"]): (r["n_pixels"], r["sum_val"])
            for r in raster_cell_stats(df, res=res).collect()
        }
        sub = {k: v for k, v in pyr.items() if k[0] == res}
        assert sub == direct, res


def test_raster_zonal_stats_matches_numpy(spark):
    """Zonal stats (raster x vector join) vs a direct numpy reference:
    pixel -> res-6 cell partials -> cell-center-in-rect assignment ->
    per-zone count/sum/mean. Zones partially overlap rasters and one
    zone is empty."""
    import pandas as pd

    from geoharvest_spark.index import ghcell_nx, ghcell_ny
    from geoharvest_spark.raster import raster_zonal_stats

    res = 6
    nx, ny = ghcell_nx(res), ghcell_ny(res)
    step_x, step_y = 360.0 / nx, 180.0 / ny

    rows = []
    pix = []  # (lon, lat, val) pixel centers
    for rid in range(5):
        h, w = 10 + rid, 14 + rid
        rr, cc = np.mgrid[0:h, 0:w]
        img = ((rr * 3 + cc * 2 + rid) % 97).astype(np.uint8)
        lon0, lat0 = -40.0 + rid * 13.25, 25.0 - rid * 6.5
        rows.append((rid, encode_tiff(img, pixel_scale=(0.5, 0.5),
                                      tiepoint=(lon0, lat0))))
        lon = lon0 + (np.arange(w) + 0.5) * 0.5
        lat = lat0 - (np.arange(h) + 0.5) * 0.5
        for yi in range(h):
            for xi in range(w):
                pix.append((lon[xi], lat[yi], int(img[yi, xi])))
    rows.append((99, b"junk"))

    zones = [
        ("z_west", -40.005, -10.005, -20.005, 30.005),
        ("z_east", -20.005, -10.005, 10.005, 30.005),
        ("z_empty", 100.005, 70.005, 120.005, 80.005),
    ]

    # numpy reference
    cells: dict[tuple[int, int], list[int]] = {}
    for lo, la, v in pix:
        x = min(max(int(np.floor((lo + 180.0) / 360.0 * nx)), 0), nx - 1)
        y = min(max(int(np.floor((la + 90.0) / 180.0 * ny)), 0), ny - 1)
        c = cells.setdefault((x, y), [0, 0])
        c[0] += 1
        c[1] += v
    expect: dict[str, list[int]] = {}
    for (x, y), (n, s) in cells.items():
        clon = (x + 0.5) * step_x - 180.0
        clat = (y + 0.5) * step_y - 90.0
        for zid, zw, zs, ze, zn in zones:
            if zw <= clon <= ze and zs <= clat <= zn:
                e = expect.setdefault(zid, [0, 0, 0])
                e[0] += 1
                e[1] += n
                e[2] += s

    def rect_wkt(w, s, e, n):
        return (
            f"POLYGON (({w} {s}, {e} {s}, {e} {n}, {w} {n}, {w} {s}))"
        )

    zdf = spark.createDataFrame(
        [
            (zid, rect_wkt(zw, zs, ze, zn),
             {"w": zw, "e": ze, "n": zn, "s": zs})
            for zid, zw, zs, ze, zn in zones
        ],
        "poly_id string, wkt string, bbox struct<w:double,e:double,n:double,s:double>",
    )
    df = spark.createDataFrame(rows, "rid int, payload binary")
    got = {
        r["poly_id"]: (r["n_cells"], r["n_pixels"], r["sum_val"], r["mean_val"])
        for r in raster_zonal_stats(df, zdf, res=res, pip_res=4).collect()
    }
    assert set(got) == set(expect)  # empty zone absent from both
    for zid, (n_cells, n_pix, s_val) in expect.items():
        assert got[zid][0] == n_cells
        assert got[zid][1] == n_pix
        assert got[zid][2] == s_val
        assert got[zid][3] == s_val / n_pix


def _split_jpeg_tables(jp: bytes):
    """Move DQT/DHT segments of a JPEG stream into an abbreviated
    JPEGTables stream (SOI..tables..EOI), per TIFF Tech Note 2."""
    import struct as _s

    i, tables, rest = 2, b"", b""
    while i < len(jp):
        m = jp[i + 1]
        if m == 0xD9:
            rest += jp[i : i + 2]
            break
        if m == 0xDA:
            rest += jp[i:]
            break
        (ln,) = _s.unpack(">H", jp[i + 2 : i + 4])
        seg = jp[i : i + 2 + ln]
        if m in (0xDB, 0xC4):
            tables += seg
        else:
            rest += seg
        i += 2 + ln
    return b"\xff\xd8" + tables + b"\xff\xd9", b"\xff\xd8" + rest


def test_tiff_jpeg_strips_roundtrip():
    # compression 7: strip is a real JPEG; decode must equal decoding
    # the same JPEG directly (gray photometric 1, color photometric 6)
    from geoharvest_spark.multimodal import decode_jpeg, encode_jpeg
    from geoharvest_spark.raster import decode_tiff, encode_tiff

    rng = np.random.RandomState(7)
    g = np.clip(
        np.add.outer(np.arange(24) * 3, np.arange(32) * 2)
        + rng.randint(0, 8, (24, 32)),
        0,
        255,
    ).astype(np.uint8)
    rgb = np.stack([g, 255 - g, (g.astype(int) * 2 % 256)], axis=2).astype(
        np.uint8
    )
    for img in (g, rgb):
        t = encode_tiff(
            img, pixel_scale=(0.1, 0.1), tiepoint=(10.0, 50.0), compression=7
        )
        out, meta = decode_tiff(t)
        ref = decode_jpeg(encode_jpeg(img, quality=95, subsample="444"))
        assert meta["compression"] == 7
        assert np.array_equal(out, ref)
        assert meta["geotransform"] == (10.0, 0.1, 50.0, 0.1)
        # lossy but close
        assert np.max(np.abs(out.astype(int) - img.astype(int))) <= 24


def test_tiff_jpeg_tables_tag():
    # shared-tables layout: DQT/DHT live in tag 347, strip keeps the rest
    import struct as _s

    from geoharvest_spark.raster import decode_tiff, encode_tiff

    g = np.tile(np.arange(32, dtype=np.uint8) * 8, (24, 1))
    t = encode_tiff(g, compression=7)
    (ifd,) = _s.unpack("<I", t[4:8])
    (n,) = _s.unpack("<H", t[ifd : ifd + 2])
    tags = {}
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag, typ, cnt = _s.unpack("<HHI", t[o : o + 8])
        tags[tag] = (typ, cnt, t[o + 8 : o + 12])
    (soff,) = _s.unpack("<I", tags[273][2])
    (scnt,) = _s.unpack("<I", tags[279][2])
    tbl_stream, strip = _split_jpeg_tables(t[soff : soff + scnt])
    hdr = 8 + 2 + 12 * (n + 1) + 4
    out = bytearray(
        b"II*\x00" + _s.pack("<I", 8) + _s.pack("<H", n + 1)
    )
    entries = [
        [tag, typ, cnt, raw] for tag, (typ, cnt, raw) in tags.items()
    ] + [[347, 7, len(tbl_stream), None]]
    for tag, typ, cnt, raw in sorted(entries):
        if tag == 347:
            raw = _s.pack("<I", hdr)
        elif tag == 273:
            raw = _s.pack("<I", hdr + len(tbl_stream))
        elif tag == 279:
            raw = _s.pack("<I", len(strip))
        out += _s.pack("<HHI", tag, typ, cnt) + raw[:4].ljust(4, b"\x00")
    out += _s.pack("<I", 0)
    assert len(out) == hdr
    out += tbl_stream + strip
    got, _ = decode_tiff(bytes(out))
    ref, _ = decode_tiff(t)
    assert np.array_equal(got, ref)


def test_tiff_jpeg_gates():
    import pytest as _pt

    from geoharvest_spark.raster import decode_tiff, encode_tiff

    g = np.zeros((8, 8), dtype=np.uint8)
    with _pt.raises(ValueError):
        encode_tiff(g, compression=7, predictor=2)
    # YCbCr photometric without JPEG compression is an honest gate
    t = encode_tiff(np.zeros((8, 8, 3), dtype=np.uint8), compression=7)
    bad = bytearray(t)
    # flip compression tag 259 value from 7 to 1 (leave photometric 6)
    import struct as _s

    (ifd,) = _s.unpack("<I", t[4:8])
    (n,) = _s.unpack("<H", t[ifd : ifd + 2])
    for i in range(n):
        o = ifd + 2 + 12 * i
        tag = _s.unpack("<H", t[o : o + 2])[0]
        if tag == 259:
            bad[o + 8 : o + 10] = _s.pack("<H", 1)
    with _pt.raises(NotImplementedError):
        decode_tiff(bytes(bad))
