"""Progressive (SOF2) JPEG decoder tests.

Strategy: a test-side progressive EMITTER reuses the library's forward
transform (same planes/padding/quant math as encode_jpeg) to produce the
IDENTICAL quantized coefficients, then transmits them progressively —
interleaved DC-first at Al=1, per-component AC spectral bands at Al=1,
AC successive-approximation refinement (correction bits, ZRL runs), and
a DC refinement scan. Since progressive transmission only REORDERS
coefficient bits, decoding the progressive stream must reproduce the
sequential decode of the same image byte-for-byte — the strongest
available anchor without external codec wheels (decode_jpeg's sequential
path is itself golden-tested).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from geoharvest_spark.multimodal import (
    _HUFF_AC_CHR,
    _HUFF_AC_LUM,
    _HUFF_DC_CHR,
    _HUFF_DC_LUM,
    _BitWriter,
    _DCT_C,
    _ZZ,
    _huff_encode_table,
    _pad_to,
    _quality_tables,
    decode_image,
    decode_jpeg,
    encode_jpeg,
)


def _coefficient_grids(img, quality, subsample):
    """encode_jpeg's forward path, stopped at quantized coefficients:
    per-comp (grid_y, grid_x, 64) int arrays in ZIGZAG order (index k is
    the zigzag position, exactly the sequence the scans transmit)."""
    img = np.asarray(img)
    gray = img.ndim == 2 or img.shape[2] == 1
    if gray:
        planes = [img.reshape(img.shape[0], img.shape[1]).astype(np.float64)]
    else:
        rgb = img[:, :, :3].astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    h, w = planes[0].shape
    qt_l, qt_c = _quality_tables(quality)
    sub420 = (not gray) and subsample == "420"
    if sub420:
        for i in (1, 2):
            p = _pad_to(planes[i], 2, 2)
            planes[i] = p.reshape(
                p.shape[0] // 2, 2, p.shape[1] // 2, 2
            ).mean(axis=(1, 3))
        samp = [(2, 2), (1, 1), (1, 1)]
        planes = [
            _pad_to(planes[0], 16, 16),
            _pad_to(planes[1], 8, 8),
            _pad_to(planes[2], 8, 8),
        ]
    else:
        samp = [(1, 1)] * len(planes)
        planes = [_pad_to(p, 8, 8) for p in planes]
    qts = [qt_l] + [qt_c] * (len(planes) - 1)
    grids = []
    for pl, qt in zip(planes, qts):
        gy, gx = pl.shape[0] // 8, pl.shape[1] // 8
        grid = np.zeros((gy, gx, 64), dtype=np.int64)
        for by in range(gy):
            for bx in range(gx):
                blk = pl[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                c = _DCT_C @ (blk - 128.0) @ _DCT_C.T
                grid[by, bx] = np.rint(c.reshape(-1) / qt).astype(np.int64)[
                    _ZZ
                ]
        grids.append(grid)
    return h, w, samp, qts, grids, gray


class _ScanWriter:
    """_BitWriter wrapper that also buffers refinement correction bits
    (the spec's BE buffer: corrections flush after the next symbol)."""

    def __init__(self):
        self.bw = _BitWriter()
        self.pending: list[int] = []

    def sym(self, tab, symbol):
        code, ln = tab[symbol]
        self.bw.write(code, ln)

    def bits(self, v, n):
        if n:
            self.bw.write(v, n)

    def flush_pending(self):
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def body(self) -> bytes:
        self.bw.flush()
        return bytes(self.bw.out)


def _mag(v):
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg_progressive(img, quality=90, subsample="444"):
    """Progressive emitter (test oracle): DC-first interleaved Al=1 ->
    per-comp AC first 1..63 Al=1 -> per-comp AC refine Ah=1,Al=0 ->
    DC refine Ah=1,Al=0. Standard Annex-K Huffman tables (EOB runs
    limited to EOB0, which those tables can express)."""
    h, w, samp, qts, grids, gray = _coefficient_grids(img, quality, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    nc = len(grids)
    dc_tabs = [_huff_encode_table(*_HUFF_DC_LUM)] + [
        _huff_encode_table(*_HUFF_DC_CHR)
    ] * (nc - 1)
    ac_tabs = [_huff_encode_table(*_HUFF_AC_LUM)] + [
        _huff_encode_table(*_HUFF_AC_CHR)
    ] * (nc - 1)

    def comp_blocks(ci):
        hc, vc = samp[ci]
        cw = -(-(w * hc) // hmax)
        chh = -(-(h * vc) // vmax)
        return -(-chh // 8), -(-cw // 8)

    def seg(marker, data):
        return struct.pack(">BBH", 0xFF, marker, len(data) + 2) + data

    def sos_header(comps, ss, se, ah, al):
        d = bytes([len(comps)])
        for ci in comps:
            d += bytes([ci + 1, (0x00 if ci == 0 else 0x11)])
        d += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, d)

    scans: list[bytes] = []

    # scan 1: DC first, interleaved, Al=1 (diffs on the floor-shifted DC)
    sw = _ScanWriter()
    preds = [0] * nc
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci in range(nc):
            hc, vc = samp[ci]
            for by in range(vc):
                for bx in range(hc):
                    dc = int(grids[ci][my * vc + by, mx * hc + bx, 0]) >> 1
                    s, bits = _mag(dc - preds[ci])
                    sw.sym(dc_tabs[ci], s)
                    sw.bits(bits, s)
                    preds[ci] = dc
    scans.append(sos_header(list(range(nc)), 0, 0, 0, 1) + sw.body())

    # per-comp AC first scans, Ss=1..63, Al=1
    for ci in range(nc):
        sw = _ScanWriter()
        bh_, bw_ = comp_blocks(ci)
        for by in range(bh_):
            for bx in range(bw_):
                zz = grids[ci][by, bx]
                vz = [
                    int(v) // 2 if v >= 0 else -((-int(v)) // 2)
                    for v in zz
                ]  # AC point transform truncates toward zero
                nz = [k for k in range(1, 64) if vz[k] != 0]
                last = nz[-1] if nz else 0
                run = 0
                for k in range(1, last + 1):
                    v = vz[k]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        sw.sym(ac_tabs[ci], 0xF0)
                        run -= 16
                    s, bits = _mag(v)
                    sw.sym(ac_tabs[ci], (run << 4) | s)
                    sw.bits(bits, s)
                    run = 0
                if last < 63:
                    sw.sym(ac_tabs[ci], 0x00)  # EOB0
        scans.append(sos_header([ci], 1, 63, 0, 1) + sw.body())

    # per-comp AC refine scans, Ss=1..63, Ah=1, Al=0
    for ci in range(nc):
        sw = _ScanWriter()
        bh_, bw_ = comp_blocks(ci)
        for by in range(bh_):
            for bx in range(bw_):
                zz = grids[ci][by, bx]
                run = 0
                sw.pending = []
                # last NEWLY-nonzero position: ZRLs are only emitted up
                # to here; longer tails fold into the EOB (and a ZRL may
                # fire at a HISTORY coefficient, BEFORE its correction
                # bit joins the buffer — the flushed bits must cover
                # exactly the ZRL's 16-zero-history span)
                newly = [k for k in range(1, 64) if abs(int(zz[k])) == 1]
                eobk = newly[-1] if newly else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    t = abs(v)
                    if t == 0:
                        run += 1
                        continue
                    while run > 15 and k <= eobk:
                        sw.sym(ac_tabs[ci], 0xF0)
                        sw.flush_pending()
                        run -= 16
                    if t > 1:  # history coefficient: append correction bit
                        sw.pending.append(t & 1)
                        continue
                    sw.sym(ac_tabs[ci], (run << 4) | 1)
                    sw.bits(1 if v > 0 else 0, 1)
                    sw.flush_pending()
                    run = 0
                if run > 0 or sw.pending:
                    sw.sym(ac_tabs[ci], 0x00)  # EOB covers the tail
                    sw.flush_pending()
        scans.append(sos_header([ci], 1, 63, 1, 0) + sw.body())

    # final scan: DC refine, interleaved, Ah=1, Al=0 (raw low bits)
    sw = _ScanWriter()
    for mcu in range(mcus_x * mcus_y):
        my, mx = divmod(mcu, mcus_x)
        for ci in range(nc):
            hc, vc = samp[ci]
            for by in range(vc):
                for bx in range(hc):
                    sw.bits(int(grids[ci][my * vc + by, mx * hc + bx, 0]) & 1, 1)
    scans.append(sos_header(list(range(nc)), 0, 0, 1, 0) + sw.body())

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    out += seg(0xDB, bytes([0x00]) + bytes(qts[0][_ZZ].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([0x01]) + bytes(qts[1][_ZZ].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci, (hc, vc) in enumerate(samp):
        sof += bytes([ci + 1, (hc << 4) | vc, 0 if ci == 0 else 1])
    out += seg(0xC2, sof)
    for tc, th, (bits, vals) in (
        (0, 0, _HUFF_DC_LUM),
        (1, 0, _HUFF_AC_LUM),
        (0, 1, _HUFF_DC_CHR),
        (1, 1, _HUFF_AC_CHR),
    ):
        if gray and th == 1:
            continue
        out += seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    for s in scans:
        out += s
    out += b"\xff\xd9"
    return bytes(out)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + seed) % 256, (xx * 2 + 80) % 256, ((yy + xx) * 2) % 256],
        axis=2,
    ).astype(np.uint8)


@pytest.mark.parametrize(
    "shape,quality,subsample",
    [
        ((24, 32), 90, "444"),
        ((24, 32), 92, "420"),
        ((23, 31), 85, "420"),  # non-multiple dims: partial MCUs
        ((16, 16), 75, "444"),  # coarser tables -> denser zero runs
    ],
)
def test_progressive_equals_sequential_decode(shape, quality, subsample):
    img = _gradient(*shape, seed=shape[0])
    seq = encode_jpeg(img, quality=quality, subsample=subsample)
    prog = encode_jpeg_progressive(img, quality=quality, subsample=subsample)
    assert prog[:2] == b"\xff\xd8" and b"\xff\xc2" in prog[:256]
    a = decode_jpeg(seq)
    b = decode_jpeg(prog)
    assert a.shape == b.shape
    assert np.array_equal(a, b), (
        f"progressive decode diverged: maxdiff="
        f"{int(np.abs(a.astype(int) - b.astype(int)).max())}"
    )


def test_progressive_grayscale():
    img = (_gradient(24, 24)[:, :, 0]).astype(np.uint8)
    seq = encode_jpeg(img, quality=88, subsample="444")
    prog = encode_jpeg_progressive(img, quality=88, subsample="444")
    assert np.array_equal(decode_jpeg(seq), decode_jpeg(prog))


def test_progressive_random_noise_images():
    """Noise maximizes coefficient density — stresses ZRL runs, EOB
    placement, and correction-bit ordering in the refine scans."""
    rs = np.random.RandomState(42)
    for trial in range(4):
        img = rs.randint(0, 256, size=(17 + trial, 19 + trial, 3)).astype(
            np.uint8
        )
        sub = "420" if trial % 2 else "444"
        seq = encode_jpeg(img, quality=80 + trial * 5, subsample=sub)
        prog = encode_jpeg_progressive(
            img, quality=80 + trial * 5, subsample=sub
        )
        assert np.array_equal(decode_jpeg(seq), decode_jpeg(prog)), trial


def test_progressive_through_decode_image():
    """decode_image dispatches progressive payloads natively now (they
    used to fall through to the PIL gate)."""
    img = _gradient(16, 24)
    prog = encode_jpeg_progressive(img, quality=90, subsample="444")
    out = decode_image(prog)
    assert out.shape == (16, 24, 3)


def test_progressive_truncation_raises_valueerror():
    img = _gradient(24, 32)
    prog = encode_jpeg_progressive(img, quality=90, subsample="444")
    with pytest.raises(ValueError):
        decode_jpeg(prog[: len(prog) * 2 // 3])


def test_progressive_fuzz_shapes_qualities():
    """Seeded fuzz across shapes, qualities (30 stresses long runs /
    EOB storms), subsamplings, and content classes (noise, gradient,
    flat): progressive decode must equal sequential decode exactly."""
    rs = np.random.RandomState(7)
    for trial in range(20):
        h, w = int(rs.randint(8, 49)), int(rs.randint(8, 49))
        q = int(rs.choice([30, 50, 70, 80, 90, 95]))
        sub = str(rs.choice(["444", "420"]))
        kind = trial % 3
        if kind == 0:
            img = rs.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        elif kind == 1:
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [(yy * 5) % 256, (xx * 3) % 256, ((xx + yy) * 2) % 256],
                axis=2,
            ).astype(np.uint8)
        else:
            img = np.full((h, w, 3), int(rs.randint(0, 256)), dtype=np.uint8)
        seq = encode_jpeg(img, quality=q, subsample=sub)
        prog = encode_jpeg_progressive(img, quality=q, subsample=sub)
        assert np.array_equal(decode_jpeg(seq), decode_jpeg(prog)), (
            trial, h, w, q, sub, kind,
        )
