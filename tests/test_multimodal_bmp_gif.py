"""BMP + GIF decoders (round 5): round-trips through the encoder twins,
hand-built spec fixtures (a hand-coded LZW stream anchors the decoder
independently of the encoder), interlacing, palettes, malformed inputs."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geoharvest_spark.multimodal import (
    decode_bmp,
    decode_gif,
    decode_image,
    encode_bmp,
    encode_gif,
)


def _img(h, w, seed=1):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7 + seed) % 256, (xx * 11) % 256, ((yy + xx) * 3) % 256],
        axis=2,
    ).astype(np.uint8)


def test_bmp_roundtrip_24bit():
    for h, w in ((5, 7), (8, 8), (3, 13)):  # odd widths exercise padding
        img = _img(h, w)
        out = decode_bmp(encode_bmp(img))
        assert np.array_equal(out, img)


def test_bmp_8bit_palette_and_topdown():
    # hand-built 8-bit paletted BMP, top-down (negative height)
    w, h = 4, 2
    pal = [(255, 0, 0, 0), (0, 255, 0, 0), (0, 0, 255, 0), (9, 9, 9, 0)]
    idx = [[0, 1, 2, 3], [3, 2, 1, 0]]
    row_bytes = (w + 3) & ~3
    body = b"".join(bytes(r) + b"\x00" * (row_bytes - w) for r in idx)
    off = 14 + 40 + 4 * len(pal)
    buf = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    buf += struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 8, 0, len(body),
                       2835, 2835, len(pal), 0)
    for b, g, r, x in [(p[2], p[1], p[0], p[3]) for p in pal]:
        buf += bytes([b, g, r, x])
    out = decode_bmp(buf + body)
    assert out.shape == (h, w, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 3].tolist() == [9, 9, 9]
    assert out[1, 0].tolist() == [9, 9, 9]  # top-down: first row is row 0


def test_bmp_malformed():
    with pytest.raises(ValueError):
        decode_bmp(b"XX" + b"\x00" * 60)
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)
    good = encode_bmp(_img(4, 4))
    with pytest.raises(ValueError):
        decode_bmp(good[:-8])  # pixel data truncated
    comp = bytearray(good)
    comp[30] = 1  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_bmp(bytes(comp))


def test_gif_hand_built_lzw_fixture():
    """2x2 image with 2-bit codes, LZW stream written by hand:
    min_code_size=2 -> clear=4, end=5, initial width 3; the table
    reaches 8 entries after the '2' code, so '1' and END read at 4 bits.
    codes: CLEAR(4), 0, 1, 2, 1, END(5) -> pixels [0,1,2,1]."""
    pal = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  7, 7, 7])
    codes = [(4, 3), (0, 3), (1, 3), (2, 3), (1, 4), (5, 4)]
    acc = nbits = 0
    lzw = bytearray()
    for c, w_ in codes:
        acc |= c << nbits
        nbits += w_
        while nbits >= 8:
            lzw.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        lzw.append(acc & 0xFF)
    buf = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 0, 0) + pal
    buf += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    buf += bytes([2, len(lzw)]) + bytes(lzw) + b"\x00\x3b"
    out = decode_gif(buf)
    assert out.shape == (2, 2, 3)
    assert out[0, 0].tolist() == [255, 0, 0]
    assert out[0, 1].tolist() == [0, 255, 0]
    assert out[1, 0].tolist() == [0, 0, 255]
    assert out[1, 1].tolist() == [0, 255, 0]


def test_gif_roundtrip_and_width_growth():
    """Images whose palette + pixel count push LZW through code-width
    growth boundaries (table past 8/16/32... entries)."""
    rs = np.random.RandomState(3)
    for trial, (h, w, ncol) in enumerate(
        [(2, 2, 2), (9, 9, 4), (16, 16, 16), (31, 37, 200), (64, 64, 256)]
    ):
        pal = rs.randint(0, 256, size=(ncol, 3)).astype(np.uint8)
        pal = np.unique(pal, axis=0)
        idx = rs.randint(0, len(pal), size=(h, w))
        img = pal[idx]
        out = decode_gif(encode_gif(img))
        assert np.array_equal(out, img), trial


def test_gif_interlaced_roundtrip():
    img = _img(17, 9) // 32 * 32  # bounded distinct colors
    out = decode_gif(encode_gif(img, interlace=True))
    assert np.array_equal(out, img)
    # and the non-interlaced twin decodes identically
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_extensions_skipped_and_dispatch():
    img = _img(6, 6) // 64 * 64
    raw = bytearray(encode_gif(img))
    # splice a Graphic Control Extension before the image descriptor
    i = raw.index(0x2C)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    buf = bytes(raw[:i]) + gce + bytes(raw[i:])
    assert np.array_equal(decode_gif(buf), img)
    assert np.array_equal(decode_image(buf), img)
    assert np.array_equal(decode_image(encode_bmp(img)), img)


def test_gif_malformed():
    with pytest.raises(ValueError):
        decode_gif(b"GIF00a" + b"\x00" * 20)
    good = encode_gif(_img(8, 8) // 64 * 64)
    with pytest.raises(ValueError):
        decode_gif(good[: len(good) - 6])  # truncated mid-data
    with pytest.raises(ValueError):
        decode_gif(good[:13] + b"\x3b")  # no image before trailer


def test_gif_offset_frame_composited_on_screen_canvas():
    """Optimized GIFs crop frame 1 to its changed region: a sub-image at
    (left, top) on a larger logical screen must come back as the full
    screen canvas (bg-filled), not the bare sub-image (ADVICE r5)."""
    import struct

    import numpy as np

    from geoharvest_spark.multimodal import decode_gif, encode_gif

    rng = np.random.default_rng(7)
    img = (rng.integers(0, 4, (5, 4, 3)) * 60).astype(np.uint8)
    raw = bytearray(encode_gif(img))
    # widen the logical screen to 10x8 and move the frame to (left=2, top=1)
    sw, sh, left, top = 10, 8, 2, 1
    raw[6:10] = struct.pack("<HH", sw, sh)
    flags = raw[10]
    gct_n = 2 << (flags & 7)
    desc = 13 + gct_n * 3
    assert raw[desc] == 0x2C
    raw[desc + 1 : desc + 5] = struct.pack("<HH", left, top)
    out = decode_gif(bytes(raw))
    assert out.shape == (sh, sw, 3)
    # frame placed at (top, left)
    assert (out[top : top + 5, left : left + 4] == img).all()
    # everything else is the background color (GCT entry 0)
    pal0 = np.frombuffer(bytes(raw[13:16]), dtype=np.uint8)
    mask = np.ones((sh, sw), dtype=bool)
    mask[top : top + 5, left : left + 4] = False
    assert (out[mask] == pal0).all()
    # frame exceeding the screen is an honest error, not silent wrap
    raw[desc + 1 : desc + 5] = struct.pack("<HH", 8, 5)
    import pytest

    with pytest.raises(ValueError):
        decode_gif(bytes(raw))
