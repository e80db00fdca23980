"""VP8L (WebP lossless) codec: encoder round-trips, hand-built
bit-level fixtures for the paths the fixture encoder does not emit
(LZ77, color cache, palette bundling, predictor/color transforms,
meta groups, simple codes), and the documented gates."""

from __future__ import annotations

import numpy as np
import pytest

from geoharvest_spark.webp import (
    _BitWriter,
    _canonical_codes,
    _fixed_complete_lengths,
    _write_code_msb,
    _write_complex_code,
    decode_webp,
    encode_webp_lossless,
    wrap_riff,
)


def _rand_img(h, w, seed, channels=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, channels)).astype(np.uint8)


def test_roundtrip_rgb():
    img = _rand_img(13, 17, 7)
    out = decode_webp(encode_webp_lossless(img))
    assert out.shape == (13, 17, 4)
    assert np.array_equal(out[:, :, :3], img)
    assert (out[:, :, 3] == 255).all()


def test_roundtrip_rgba_and_subtract_green():
    img = _rand_img(9, 5, 11, channels=4)
    for sg in (False, True):
        out = decode_webp(encode_webp_lossless(img, subtract_green=sg))
        assert np.array_equal(out, img), f"subtract_green={sg}"


def test_roundtrip_1x1_and_row():
    img = np.array([[[1, 2, 3]]], np.uint8)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(img))[:, :, :3], img
    )
    row = _rand_img(1, 30, 3)
    assert np.array_equal(
        decode_webp(encode_webp_lossless(row))[:, :, :3], row
    )


class _Stream:
    """Hand-built VP8L stream: header + helpers for tiny images coded
    with SIMPLE prefix codes (the bit-level fixture rig)."""

    def __init__(self, w, h):
        self.bw = _BitWriter()
        self.bw.write(w - 1, 14)
        self.bw.write(h - 1, 14)
        self.bw.write(0, 1)
        self.bw.write(0, 3)

    def no_transforms(self):
        self.bw.write(0, 1)
        return self

    def payload(self):
        return wrap_riff(bytes([0x2F]) + self.bw.bytes())


def _simple_code(bw, symbols):
    """SIMPLE prefix code: 1 or 2 symbols (8-bit form)."""
    bw.write(1, 1)  # simple
    bw.write(len(symbols) - 1, 1)
    bw.write(1, 1)  # first symbol is 8-bit
    bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def test_handbuilt_literals_simple_codes():
    # 2x2: green alternates 10/20 (1-bit code), r/b/a constant (0-bit)
    st = _Stream(2, 2).no_transforms()
    bw = st.bw
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple_code(bw, [10, 20])  # green
    _simple_code(bw, [7])       # red
    _simple_code(bw, [9])       # blue
    _simple_code(bw, [255])     # alpha
    _simple_code(bw, [1])       # distance (unused)
    for bit in (0, 1, 1, 0):    # greens: 10,20,20,10
        bw.write(bit, 1)
    out = decode_webp(st.payload())
    assert out[:, :, 1].tolist() == [[10, 20], [20, 10]]
    assert (out[:, :, 0] == 7).all() and (out[:, :, 2] == 9).all()
    assert (out[:, :, 3] == 255).all()


def test_handbuilt_lz77_far_distance():
    # 4x1: one literal pixel then a backref of length 3, distance 1
    # (encoded as dist_code = 121 -> distance 1, the far form)
    st = _Stream(4, 1).no_transforms()
    bw = st.bw
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # green code: symbol 5 (literal) and 256 (length prefix 0 -> len 1?
    # prefix 2 -> length 3): use symbols {5, 258}
    _simple_code(bw, [5])  # green... must also carry length symbol
    # need green alphabet with 2 symbols: 5 and 256+2 (=258, length 3)
    # rebuild: SIMPLE with two symbols only supports 8-bit values —
    # 258 > 255, so use the complex path for green instead.
    # Rebuild the stream from scratch below.
    st = _Stream(4, 1).no_transforms()
    bw = st.bw
    bw.write(0, 1)
    bw.write(0, 1)
    glens = [0] * (256 + 24)
    glens[5] = 1       # literal green 5
    glens[256 + 2] = 1  # length prefix 2 -> length 3 (no extra bits)
    _write_complex_code(bw, glens)
    _simple_code(bw, [1])    # red
    _simple_code(bw, [2])    # blue
    _simple_code(bw, [255])  # alpha
    # distance code: prefix 36: extra=(36-2)>>1=17, offset=(2+0)<<17;
    # too big — use prefix value for dist_code 121: find prefix p with
    # range covering 121: p=12 -> extra=5, offset=(2+0)<<5=64,
    # value=64+rb(5)+1 in [65..96]; p=13 -> offset=(2+1)<<5=96,
    # value in [97..128] -> dist_code 121 = 96 + 24 + 1 -> extra bits 24
    _simple_code(bw, [13])
    gcodes = _canonical_codes(glens)
    ln, code = gcodes[5]
    _write_code_msb(bw, ln, code)  # literal green
    # its r/b/a consume 0 bits (single-symbol codes)
    ln, code = gcodes[256 + 2]
    _write_code_msb(bw, ln, code)  # length 3
    # distance prefix 13 consumes 0 bits (single); extra 5 bits = 24
    bw.write(24, 5)
    out = decode_webp(st.payload())
    assert out[:, :, 1].tolist() == [[5, 5, 5, 5]]
    assert out[:, :, 0].tolist() == [[1, 1, 1, 1]]


def test_handbuilt_color_cache():
    # 3x1: literal pixel, then the SAME pixel via the color cache
    st = _Stream(3, 1).no_transforms()
    bw = st.bw
    bw.write(1, 1)  # cache present
    cache_bits = 4
    bw.write(cache_bits, 4)
    px = (255 << 24) | (40 << 16) | (30 << 8) | 20
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bw.write(0, 1)  # no meta
    glens = [0] * (256 + 24 + (1 << cache_bits))
    glens[30] = 1                  # literal green 30
    glens[256 + 24 + idx] = 1      # cache hit
    _write_complex_code(bw, glens)
    _simple_code(bw, [40])   # red
    _simple_code(bw, [20])   # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [1])    # distance (unused)
    gcodes = _canonical_codes(glens)
    for sym in (30, 256 + 24 + idx, 256 + 24 + idx):
        ln, code = gcodes[sym]
        _write_code_msb(bw, ln, code)
    out = decode_webp(st.payload())
    assert out[0].tolist() == [[40, 30, 20, 255]] * 3


def test_handbuilt_palette_with_bundling():
    # 6x1 image, 2-color palette -> width_bits=3 (8 px/byte), packed
    # width 1: a single coded pixel whose green carries 6 index bits
    st = _Stream(6, 1)
    bw = st.bw
    bw.write(1, 1)  # transform present
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(1, 8)  # n_colors - 1 = 1 -> 2 colors
    # palette image (2x1), delta-coded: first (255,10,10,10), second
    # delta (0, 40, 40, 40) -> (255,50,50,50)
    bw.write(0, 1)  # palette stream: no cache
    _simple_code(bw, [10, 40])  # green
    _simple_code(bw, [10, 40])  # red
    _simple_code(bw, [10, 40])  # blue
    _simple_code(bw, [255, 0])  # alpha
    _simple_code(bw, [1])       # distance
    # canonical codes assign bit 0 to the SMALLER symbol: px0 reads
    # (g,r,b)=10 (bit 0) and a=255 (bit 1); px1 delta reads 40/0
    for bit in (0, 0, 0, 1, 1, 1, 1, 0):
        bw.write(bit, 1)
    bw.write(0, 1)  # end of transforms
    # main (packed) image: 1x1, green byte = indices 0,1,0,1,1,0 LSB-first
    packed = 0b0_1_1_0_1_0 ^ 0  # x0..x5 -> bits 0..5: 0,1,0,1,1,0
    packed = (0 << 0) | (1 << 1) | (0 << 2) | (1 << 3) | (1 << 4) | (0 << 5)
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    _simple_code(bw, [packed])  # green (single symbol, 0-bit reads)
    _simple_code(bw, [0])       # red
    _simple_code(bw, [0])       # blue
    _simple_code(bw, [0])       # alpha
    _simple_code(bw, [1])       # distance
    out = decode_webp(st.payload())
    want = [[10, 10, 10], [50, 50, 50], [10, 10, 10],
            [50, 50, 50], [50, 50, 50], [10, 10, 10]]
    assert out[0, :, :3].tolist() == want
    assert (out[0, :, 3] == 255).all()


def test_handbuilt_predictor_modes():
    # 2x2 with predictor transform, mode 1 (left) for the whole image:
    # residuals chosen so reconstruction is checkable by hand
    st = _Stream(2, 2)
    bw = st.bw
    bw.write(1, 1)  # transform
    bw.write(0, 2)  # PREDICTOR
    bw.write(2, 3)  # size_bits = 4 -> one block
    bw.write(0, 1)  # sub-image: no cache
    _simple_code(bw, [1])    # green = mode 1 (left)
    _simple_code(bw, [0])    # red
    _simple_code(bw, [0])    # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [1])    # distance
    bw.write(0, 1)  # end transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    # residual pixels: (a,r,g,b) deltas; all channels same value v
    _simple_code(bw, [10, 5])   # green residuals
    _simple_code(bw, [10, 5])   # red
    _simple_code(bw, [10, 5])   # blue
    _simple_code(bw, [0, 1])    # alpha residuals
    _simple_code(bw, [1])       # distance
    # canonical: bit 1 selects residual 10 (symbols {5,10}), bit 0 -> 5;
    # alpha symbols {0,1}: bit 0 -> 0. Pixels read (g, r, b, a):
    # (0,0) res 10/a0, (1,0) res 5/a1, (0,1) res 10/a0, (1,1) res 5/a1
    for bits in ((1, 1, 1, 0), (0, 0, 0, 1), (1, 1, 1, 0), (0, 0, 0, 1)):
        for b in bits:
            bw.write(b, 1)
    out = decode_webp(st.payload())
    # row 0: (0,0) res 10 + pred(0,0,0 / a=255) = rgb 10, a 255+0
    assert out[0, 0].tolist() == [10, 10, 10, 255]
    # (1,0) y=0 -> pred = left regardless of mode: rgb 15, a 255+1 = 0
    assert out[0, 1, :3].tolist() == [15, 15, 15]
    # row 1 x=0: pred = top -> 10+10=20
    assert out[1, 0, :3].tolist() == [20, 20, 20]
    # row 1 x=1: mode1 left -> 20+5=25
    assert out[1, 1, :3].tolist() == [25, 25, 25]


def test_gate_near_window_distance():
    st = _Stream(4, 1).no_transforms()
    bw = st.bw
    bw.write(0, 1)
    bw.write(0, 1)
    glens = [0] * (256 + 24)
    glens[5] = 1
    glens[256 + 2] = 1
    _write_complex_code(bw, glens)
    _simple_code(bw, [1])
    _simple_code(bw, [2])
    _simple_code(bw, [255])
    _simple_code(bw, [0])  # distance prefix 0 -> dist_code 1 (<=120)
    gcodes = _canonical_codes(glens)
    ln, code = gcodes[5]
    _write_code_msb(bw, ln, code)
    ln, code = gcodes[256 + 2]
    _write_code_msb(bw, ln, code)
    with pytest.raises(NotImplementedError, match="near-window"):
        decode_webp(st.payload())


def test_gate_vp8_lossy_and_bad_container():
    import struct as _s

    lossy = b"RIFF" + _s.pack("<I", 12) + b"WEBP" + b"VP8 " + _s.pack("<I", 0)
    with pytest.raises(NotImplementedError):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"GIF89a nope")


def test_fixed_complete_lengths_kraft():
    for n in (2, 3, 40, 256, 280, 300):
        lens = _fixed_complete_lengths(n)
        assert len(lens) == n
        assert abs(sum(2.0 ** -l for l in lens) - 1.0) < 1e-12
