"""WebP lossless (VP8L) codec: pure-stdlib/numpy decoder + a fixture
encoder, from the public "WebP Lossless Bitstream Specification".

Decoder coverage (all bit-exact round-trip-tested against the encoder
and hand-built bit-level fixtures):
- RIFF/WEBP/VP8L container + header;
- canonical prefix codes: SIMPLE (1-2 symbols, incl. the zero-bit
  single-symbol code) and COMPLEX (code-length code in kCLORDER, 16/17/
  18 repeats, optional max_symbol cap);
- meta-prefix groups (entropy image), color cache (0x1e35a7bd hash),
  LZ77 backward references — BOTH distance forms: far distances
  (code > 120) and the 120-entry near-window plane codes (the 2-D
  neighborhood table, generated from the spec's ordering rule and
  pinned entry-by-entry against the known table in tests);
- inverse transforms: SUBTRACT_GREEN, PREDICTOR (all 14 modes, spec
  Select tie-break — ties return T — and the contiguous-buffer
  top[x+1] top-right at the last column, i.e. current row col 0),
  COLOR (3.5-fixed-point channel cross-talk), COLOR_INDEXING with
  sub-byte pixel bundling (palettes <= 16), and combinations
  (inverses apply in reverse declaration order; palette+subtract-green
  fixture-tested).

Honest gates (raise NotImplementedError, never corrupt):
animated/alpha-chunked containers (VP8X) and lossy VP8 are out of
scope — this module is the LOSSLESS path of the media suite.

The color-transform element layout follows the spec's
blue/green/red = green_to_red/green_to_blue/red_to_blue reading.

At scale this decoder runs like every other codec here: inside
Arrow-batched mapInPandas over opaque binary columns (multimodal.py) —
per-image Python cost is the accepted price of a dependency-free,
auditable implementation.
"""

from __future__ import annotations

import struct

import numpy as np

_CLORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_HASH_MULT = 0x1E35A7BD


def _plane_code_table() -> list:
    """The 120 near-window LZ77 distance offsets (RFC 9649 §4.2.2).

    Distance codes 1..120 map to 2-D offsets in the 8x16 causal
    neighborhood: x in [-7, 8], y in [0, 7], excluding the non-causal
    half-row (y == 0, x <= 0); ordered by squared euclidean distance,
    larger y first on ties, then larger x first. The generated list is
    pinned against the first/last spec entries in tests/test_webp.py.
    """
    offs = [
        (x, y)
        for y in range(8)
        for x in range(-7, 9)
        if not (y == 0 and x <= 0)
    ]
    offs.sort(key=lambda o: (o[0] * o[0] + o[1] * o[1], -o[1], -o[0]))
    return offs


_PLANE_OFFSETS = _plane_code_table()


class _BitReader:
    """LSB-first bit reader (VP8L convention)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _BitWriter:
    """LSB-first bit writer (encoder / fixture twin)."""

    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n):
            self.bits.append((v >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


class _Huffman:
    """Canonical prefix code (DEFLATE-style assignment: codes ordered by
    (length, symbol); bits arrive MSB-of-code-first through the LSB-first
    stream). A single-symbol code consumes ZERO bits per read."""

    def __init__(self, lengths: list[int]):
        syms = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not syms:
            raise ValueError("VP8L: empty prefix code")
        if len(syms) == 1:
            self.single = syms[0][1]
            self.table = None
            return
        self.single = None
        kraft = sum(2.0 ** -l for l, _ in syms)
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError(f"VP8L: incomplete prefix code (kraft={kraft})")
        syms.sort()
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = syms[0][0]
        for l, s in syms:
            code <<= l - prev_len
            prev_len = l
            self.table[(l, code)] = s
            code += 1
        self.max_len = prev_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for l in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            s = self.table.get((l, code))
            if s is not None:
                return s
        raise ValueError("VP8L: invalid prefix code word")


def _read_code_lengths(br: _BitReader, alphabet: int) -> _Huffman:
    """ReadHuffmanCode: simple or code-length-coded form."""
    if br.read(1):  # simple
        n_sym = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        lengths = [0] * alphabet
        if n_sym == 1:
            lengths[s0] = 1  # single-symbol (zero-bit) code
        else:
            s1 = br.read(8)
            lengths[s0] = 1
            lengths[s1] = 1
        return _Huffman(lengths)
    n_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(n_cl):
        cl_lengths[_CLORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)
    if br.read(1):
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    sym = 0
    while sym < alphabet:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        c = cl.read(br)
        if c < 16:
            lengths[sym] = c
            sym += 1
            if c:
                prev = c
        elif c == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if sym < alphabet:
                    lengths[sym] = prev
                    sym += 1
        elif c == 17:
            sym += 3 + br.read(3)
        else:
            sym += 11 + br.read(7)
    return _Huffman(lengths)


def _prefix_value(br: _BitReader, prefix: int) -> int:
    """LZ77 length/distance prefix decode: 24-code scheme."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _decode_image_stream(
    br: _BitReader, w: int, h: int, is_level0: bool
):
    """Spatially-coded image (level 0 carries transforms + meta groups);
    returns (argb uint32 array of h*w, transforms list)."""
    transforms = []
    if is_level0:
        while br.read(1):
            ttype = br.read(2)
            if ttype in (0, 1):  # PREDICTOR / COLOR
                size_bits = br.read(3) + 2
                bw = (w + (1 << size_bits) - 1) >> size_bits
                bh = (h + (1 << size_bits) - 1) >> size_bits
                sub, _ = _decode_image_stream(br, bw, bh, False)
                transforms.append((ttype, size_bits, sub))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2, None, None))
            else:  # COLOR_INDEXING
                n_colors = br.read(8) + 1
                pal_raw, _ = _decode_image_stream(br, n_colors, 1, False)
                # palette entries are component-wise deltas
                pal = pal_raw.copy()
                for i in range(1, n_colors):
                    a = (pal[i - 1] >> 24) + (pal_raw[i] >> 24)
                    r = ((pal[i - 1] >> 16) & 0xFF) + ((pal_raw[i] >> 16) & 0xFF)
                    g = ((pal[i - 1] >> 8) & 0xFF) + ((pal_raw[i] >> 8) & 0xFF)
                    b = (pal[i - 1] & 0xFF) + (pal_raw[i] & 0xFF)
                    pal[i] = (
                        ((a & 0xFF) << 24)
                        | ((r & 0xFF) << 16)
                        | ((g & 0xFF) << 8)
                        | (b & 0xFF)
                    )
                if n_colors <= 2:
                    width_bits = 3
                elif n_colors <= 4:
                    width_bits = 2
                elif n_colors <= 16:
                    width_bits = 1
                else:
                    width_bits = 0
                transforms.append((3, (pal, width_bits, w), None))
                w = (w + (1 << width_bits) - 1) >> width_bits
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache size")
    meta = None
    huffman_bits = 0
    n_groups = 1
    if is_level0 and br.read(1):
        huffman_bits = br.read(3) + 2
        mw = (w + (1 << huffman_bits) - 1) >> huffman_bits
        mh = (h + (1 << huffman_bits) - 1) >> huffman_bits
        meta_img, _ = _decode_image_stream(br, mw, mh, False)
        meta = (
            ((meta_img >> 16) & 0xFF) << 8 | ((meta_img >> 8) & 0xFF),
            mw,
        )
        n_groups = int(meta[0].max()) + 1
    cache_size = (1 << cache_bits) if cache_bits else 0
    alphabets = [256 + 24 + cache_size, 256, 256, 256, 40]
    groups = [
        [_read_code_lengths(br, a) for a in alphabets]
        for _ in range(n_groups)
    ]
    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    pos = 0
    n = w * h
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            gidx = int(meta[0][(y >> huffman_bits) * meta[1] + (x >> huffman_bits)])
        else:
            gidx = 0
        gg, gr, gb, ga, gd = groups[gidx]
        s = gg.read(br)
        if s < 256:
            g = s
            r = gr.read(br)
            b = gb.read(br)
            a = ga.read(br)
            px = (a << 24) | (r << 16) | (g << 8) | b
            out[pos] = px
            if cache_bits:
                cache[(_HASH_MULT * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif s < 256 + 24:
            length = _prefix_value(br, s - 256)
            dprefix = gd.read(br)
            dcode = _prefix_value(br, dprefix)
            if dcode <= 120:
                # near-window plane code: a 2-D neighborhood offset
                # (RFC 9649 distance mapping; libwebp emits these
                # routinely). dist = y*width + x, clamped to >= 1.
                xoff, yoff = _PLANE_OFFSETS[dcode - 1]
                dist = yoff * w + xoff
                if dist < 1:
                    dist = 1
            else:
                dist = dcode - 120
            if dist < 1 or dist > pos:
                raise ValueError("VP8L: backref out of window")
            for _ in range(length):
                if pos >= n:
                    raise ValueError("VP8L: backref overruns image")
                px = int(out[pos - dist])
                out[pos] = px
                if cache_bits:
                    cache[
                        (_HASH_MULT * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            out[pos] = cache[idx]
            pos += 1
    return out, transforms


def _inverse_transforms(
    argb: np.ndarray, w: int, h: int, transforms
) -> tuple[np.ndarray, int]:
    """Apply inverse transforms in reverse declaration order; returns the
    (possibly widened) pixel array and the final width."""
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 2:  # subtract-green inverse
            g = (argb >> 8) & 0xFF
            r = (((argb >> 16) & 0xFF) + g) & 0xFF
            b = ((argb & 0xFF) + g) & 0xFF
            argb = ((argb & 0xFF00FF00) | (r << 16) | b).astype(np.uint32)
        elif ttype == 3:  # color indexing
            pal, width_bits, orig_w = p1
            if width_bits:
                bpp = 8 >> width_bits
                per = 1 << width_bits
                mask = (1 << bpp) - 1
                packed_w = (orig_w + per - 1) >> width_bits
                wide = np.zeros(orig_w * h, dtype=np.uint32)
                for y in range(h):
                    for x in range(orig_w):
                        green = (argb[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
                        idx = (green >> (bpp * (x & (per - 1)))) & mask
                        if idx >= len(pal):
                            raise ValueError("VP8L: palette index OOB")
                        wide[y * orig_w + x] = pal[idx]
                argb = wide
                w = orig_w
            else:
                idxs = (argb >> 8) & 0xFF
                if int(idxs.max(initial=0)) >= len(pal):
                    raise ValueError("VP8L: palette index OOB")
                argb = np.asarray(pal, dtype=np.uint32)[idxs]
        elif ttype == 1:  # color transform inverse
            size_bits, sub = p1, p2
            bw = (w + (1 << size_bits) - 1) >> size_bits
            out = argb.copy()
            for y in range(h):
                for x in range(w):
                    cte = int(
                        sub[(y >> size_bits) * bw + (x >> size_bits)]
                    )
                    g2r = _i8(cte & 0xFF)
                    g2b = _i8((cte >> 8) & 0xFF)
                    r2b = _i8((cte >> 16) & 0xFF)
                    px = int(out[y * w + x])
                    a = px >> 24
                    r = (px >> 16) & 0xFF
                    g = (px >> 8) & 0xFF
                    b = px & 0xFF
                    r = (r + ((g2r * _i8(g)) >> 5)) & 0xFF
                    b = (b + ((g2b * _i8(g)) >> 5)) & 0xFF
                    b = (b + ((r2b * _i8(r)) >> 5)) & 0xFF
                    out[y * w + x] = (a << 24) | (r << 16) | (g << 8) | b
            argb = out
        elif ttype == 0:  # predictor inverse
            size_bits, sub = p1, p2
            bw = (w + (1 << size_bits) - 1) >> size_bits
            out = argb.copy()
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(out[x - 1])
                    elif x == 0:
                        pred = int(out[(y - 1) * w])
                    else:
                        mode = (
                            int(sub[(y >> size_bits) * bw + (x >> size_bits)])
                            >> 8
                        ) & 0xFF
                        L = int(out[y * w + x - 1])
                        T = int(out[(y - 1) * w + x])
                        TL = int(out[(y - 1) * w + x - 1])
                        # last-column top-right: the spec/libwebp read the
                        # contiguous buffer's top[x+1], which at x==w-1 is
                        # the CURRENT row's column 0 (already decoded)
                        TR = int(out[(y - 1) * w + x + 1])
                        pred = _predict(mode, L, T, TL, TR)
                    res = int(out[y * w + x])
                    out[y * w + x] = _addpx(res, pred)
            argb = out
    return argb, w


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _frompx(a, r, g, b) -> int:
    return ((a & 0xFF) << 24) | ((r & 0xFF) << 16) | ((g & 0xFF) << 8) | (b & 0xFF)


def _addpx(x: int, y: int) -> int:
    xa, xr, xg, xb = _chans(x)
    ya, yr, yg, yb = _chans(y)
    return _frompx(xa + ya, xr + yr, xg + yg, xb + yb)


def _avg2(x: int, y: int) -> int:
    xa, xr, xg, xb = _chans(x)
    ya, yr, yg, yb = _chans(y)
    return _frompx((xa + ya) >> 1, (xr + yr) >> 1, (xg + yg) >> 1, (xb + yb) >> 1)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _predict(mode: int, L: int, T: int, TL: int, TR: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR), T)
    if mode == 6:
        return _avg2(L, TL)
    if mode == 7:
        return _avg2(L, T)
    if mode == 8:
        return _avg2(TL, T)
    if mode == 9:
        return _avg2(T, TR)
    if mode == 10:
        return _avg2(_avg2(L, TL), _avg2(T, TR))
    if mode == 11:  # Select (spec pseudocode verbatim)
        la, lr, lg, lb = _chans(L)
        ta, tr, tg, tb = _chans(T)
        ca, cr, cg, cb = _chans(TL)
        pa = la + ta - ca
        pr = lr + tr - cr
        pg = lg + tg - cg
        pb = lb + tb - cb
        p_l = abs(pa - la) + abs(pr - lr) + abs(pg - lg) + abs(pb - lb)
        p_t = abs(pa - ta) + abs(pr - tr) + abs(pg - tg) + abs(pb - tb)
        # ties return T: the spec/libwebp pick L only when strictly
        # closer (pL < pT) — `<=` silently corrupts conformant streams
        return L if p_l < p_t else T
    if mode == 12:  # ClampAddSubtractFull
        la, lr, lg, lb = _chans(L)
        ta, tr, tg, tb = _chans(T)
        ca, cr, cg, cb = _chans(TL)
        return _frompx(
            _clamp(la + ta - ca),
            _clamp(lr + tr - cr),
            _clamp(lg + tg - cg),
            _clamp(lb + tb - cb),
        )
    if mode == 13:  # ClampAddSubtractHalf (C truncating division)
        av = _avg2(L, T)
        aa, ar, ag, ab = _chans(av)
        ca, cr, cg, cb = _chans(TL)

        def half(a, c):
            d = a - c
            q = d // 2 if d >= 0 else -((-d) // 2)
            return _clamp(a + q)

        return _frompx(half(aa, ca), half(ar, cr), half(ag, cg), half(ab, cb))
    raise ValueError(f"VP8L: predictor mode {mode} out of range")


def decode_webp(payload: bytes) -> np.ndarray:
    """RIFF/WEBP container -> (h, w, 4) uint8 RGBA (lossless VP8L only;
    VP8 lossy / VP8X extended raise NotImplementedError)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WEBP RIFF container")
    off = 12
    while off + 8 <= len(payload):
        tag = payload[off : off + 4]
        size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
        body = payload[off + 8 : off + 8 + size]
        if tag == b"VP8L":
            return _decode_vp8l(body)
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(f"WEBP: {tag.decode().strip()} chunk")
        off += 8 + size + (size & 1)
    raise ValueError("WEBP: no VP8L chunk")


def _decode_vp8l(body: bytes) -> np.ndarray:
    if not body or body[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("VP8L: unsupported version")
    argb, transforms = _decode_image_stream(br, w, h, True)
    ci = [idx for idx, t in enumerate(transforms) if t[0] == 3]
    if ci and ci[0] != len(transforms) - 1:
        # a transform declared AFTER color-indexing was read at the
        # PACKED width and its inverse must run on the packed image;
        # this module threads width only at the palette inverse —
        # honest gate for that (encoder-unused) ordering. Transforms
        # declared BEFORE color-indexing are fine: the reversed loop
        # unpacks first, then inverts them at the original width
        # (palette+subtract-green fixture-tested).
        raise NotImplementedError(
            "VP8L: transforms declared after color-indexing "
            "(packed-width threading)"
        )
    # color-indexing narrows the coded width; recover via transforms
    argb, w = _inverse_transforms(argb, w, h, transforms)
    a = (argb >> 24) & 0xFF
    r = (argb >> 16) & 0xFF
    g = (argb >> 8) & 0xFF
    b = argb & 0xFF
    return (
        np.stack([r, g, b, a], axis=-1)
        .astype(np.uint8)
        .reshape(h, w, 4)
    )


# ---------------------------------------------------------------------------
# Fixture encoder: literal-only VP8L with complete fixed-length codes
# (optionally subtract-green), and helpers for hand-built streams.
# ---------------------------------------------------------------------------


def _fixed_complete_lengths(alphabet: int) -> list[int]:
    """A complete canonical code: the unique (a, b) split with a symbols
    at length k and b at k+1 such that a/2^k + b/2^(k+1) == 1."""
    k = 1
    while (1 << k) < alphabet:
        k += 1
    if (1 << k) == alphabet:
        return [k] * alphabet
    # a + b = alphabet; 2a + b = 2^k  =>  a = 2^k - alphabet
    a = (1 << k) - alphabet
    return [k - 1] * a + [k] * (alphabet - a)


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    syms = sorted((l, s) for s, l in enumerate(lengths) if l > 0)
    out = {}
    code = 0
    prev = syms[0][0]
    for l, s in syms:
        code <<= l - prev
        prev = l
        out[s] = (l, code)
        code += 1
    return out


def _write_code_msb(bw: _BitWriter, length: int, code: int) -> None:
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_complex_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit a code via the code-length machinery, giving each DISTINCT
    length a CL codeword (complete CL code over the distinct lengths)."""
    distinct = sorted(set(lengths))
    cl_lengths = [0] * 19
    if len(distinct) == 1:
        # single-symbol CL code: the reader's zero-bit code fills every
        # length without consuming ANY per-symbol bits — emit only the
        # header (decoder _Huffman single-symbol path)
        cl_lengths[distinct[0]] = 1
        need = max(_CLORDER.index(distinct[0]) + 1, 4)
        bw.write(0, 1)  # complex
        bw.write(need - 4, 4)
        for i in range(need):
            bw.write(cl_lengths[_CLORDER[i]], 3)
        bw.write(0, 1)  # no max_symbol cap
        return
    cl_fixed = _fixed_complete_lengths(len(distinct))
    for cl_len, sym in zip(cl_fixed, distinct):
        cl_lengths[sym] = cl_len
    # num_code_lengths must cover every used CL symbol in _CLORDER
    need = max(_CLORDER.index(s) for s in distinct) + 1
    need = max(need, 4)
    bw.write(0, 1)  # complex
    bw.write(need - 4, 4)
    for i in range(need):
        bw.write(cl_lengths[_CLORDER[i]], 3)
    bw.write(0, 1)  # no max_symbol cap
    cl_codes = _canonical_codes(cl_lengths)
    for l in lengths:
        ln, code = cl_codes[l]
        _write_code_msb(bw, ln, code)


def encode_webp_lossless(
    img: np.ndarray, subtract_green: bool = False
) -> bytes:
    """Minimal conforming VP8L encoder (fixture twin): literal-only, one
    prefix-code group, no cache, complete fixed-length codes; optional
    SUBTRACT_GREEN transform. Exercises the decoder's complex-code path
    end to end on arbitrary small images."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    h, w = img.shape[:2]
    if img.shape[2] == 3:
        alpha = np.full((h, w), 255, np.uint16)
    else:
        alpha = img[:, :, 3].astype(np.uint16)
    r = img[:, :, 0].astype(np.uint16)
    g = img[:, :, 1].astype(np.uint16)
    b = img[:, :, 2].astype(np.uint16)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta groups
    lens = {
        "g": _fixed_complete_lengths(256 + 24),
        "c": _fixed_complete_lengths(256),
        "d": _fixed_complete_lengths(40),
    }
    _write_complex_code(bw, lens["g"])
    for _ in range(3):
        _write_complex_code(bw, lens["c"])
    _write_complex_code(bw, lens["d"])
    gcodes = _canonical_codes(lens["g"])
    ccodes = _canonical_codes(lens["c"])
    for y in range(h):
        for x in range(w):
            for val, codes in (
                (int(g[y, x]), gcodes),
                (int(r[y, x]), ccodes),
                (int(b[y, x]), ccodes),
                (int(alpha[y, x]), ccodes),
            ):
                ln, code = codes[val]
                _write_code_msb(bw, ln, code)
    return wrap_riff(bytes([0x2F]) + bw.bytes())


def wrap_riff(vp8l_body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_body)) + vp8l_body
    if len(vp8l_body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
