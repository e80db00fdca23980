"""FLAC decoder + fixture encoder (pure stdlib/numpy), from the public
FLAC format specification (RFC 9639 / xiph.org format docs).

Decoder coverage: STREAMINFO parsing, frame sync + header (block-size /
sample-rate / channel-assignment / sample-size codes, UTF-8-style coded
number, CRC-8 header check), all four subframe types — CONSTANT,
VERBATIM, FIXED (orders 0-4), LPC (any order, signed quantized
coefficients with arithmetic-shift prediction) — rice-coded residuals
(both 4- and 5-bit parameter methods, partition orders, the
all-ones escape to verbatim residuals), wasted bits, and the four
channel assignments (independent, left/side, right/side, mid/side).
Frame CRC-16 is verified. 8/16/24-bit samples.

The fixture encoder emits VERBATIM and FIXED(0-2) subframes with real
rice coding and correct CRCs, so the decoder's rice/fixed/CRC paths are
round-trip-tested on arbitrary integer signals; LPC and the stereo
decorrelations are covered by hand-built frames in tests.

At scale this runs like the other codecs: Arrow-batched mapInPandas
over binary columns (multimodal.py) — decode is per-blob Python, the
accepted price of a dependency-free implementation.
"""

from __future__ import annotations

import struct

import numpy as np


class _MSBReader:
    """MSB-first bit reader (FLAC convention)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("FLAC: bitstream truncated")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _MSBWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def align(self) -> None:
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (7 - (i & 7))
        return bytes(out)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _read_coded_number(br: _MSBReader) -> int:
    """UTF-8-style frame/sample number (up to 7 bytes)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: bad coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        c = br.read(8)
        if c >> 6 != 0b10:
            raise ValueError("FLAC: bad coded-number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def _read_residual(br: _MSBReader, blocksize: int, order: int) -> list[int]:
    method = br.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 + method  # rice parameter width
    escape = (1 << pbits) - 1
    part_order = br.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts:
        raise ValueError("FLAC: partition order does not divide blocksize")
    out: list[int] = []
    for p in range(n_parts):
        n = blocksize // n_parts - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            nbits = br.read(5)
            for _ in range(n):
                out.append(br.read_signed(nbits) if nbits else 0)
        else:
            for _ in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _read_subframe(
    br: _MSBReader, blocksize: int, bps: int
) -> list[int]:
    if br.read(1):
        raise ValueError("FLAC: subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.unary()
    eff = bps - wasted
    if ftype == 0:  # CONSTANT
        v = br.read_signed(eff)
        samples = [v] * blocksize
    elif ftype == 1:  # VERBATIM
        samples = [br.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        warm = [br.read_signed(eff) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        samples = list(warm)
        for r in res:
            pred = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + pred)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coefs = [br.read_signed(precision) for _ in range(order)]
        res = _read_residual(br, blocksize, order)
        samples = list(warm)
        for r in res:
            acc = sum(c * samples[-1 - i] for i, c in enumerate(coefs))
            samples.append(r + (acc >> shift))
    else:
        raise ValueError(f"FLAC: reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def decode_flac(payload: bytes) -> tuple[np.ndarray, int]:
    """FLAC -> (x, sample_rate): x is 1-D float32 in [-1, 1), channels
    averaged to mono — the same contract decode_wav exposes, so the
    audio feature path (multimodal.wav_features) applies unchanged."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    off = 4
    sample_rate = channels = bps = None
    total = 0
    while True:
        if off + 4 > len(payload):
            raise ValueError("FLAC: truncated metadata")
        hdr = payload[off]
        last = hdr >> 7
        btype = hdr & 0x7F
        blen = int.from_bytes(payload[off + 1 : off + 4], "big")
        body = payload[off + 4 : off + 4 + blen]
        if btype == 0:  # STREAMINFO
            br = _MSBReader(body)
            br.read(16)  # min blocksize
            br.read(16)  # max blocksize
            br.read(24)  # min frame
            br.read(24)  # max frame
            sample_rate = br.read(20)
            channels = br.read(3) + 1
            bps = br.read(5) + 1
            total = br.read(36)
        off += 4 + blen
        if last:
            break
    if sample_rate is None:
        raise ValueError("FLAC: missing STREAMINFO")
    chans: list[list[int]] = [[] for _ in range(channels)]
    while off < len(payload):
        off = _decode_frame(payload, off, channels, bps, chans)
        if total and len(chans[0]) >= total:
            break
    n = min(len(c) for c in chans)
    if total:
        n = min(n, total)
    arr = np.array([c[:n] for c in chans], dtype=np.int64)
    x = arr.mean(axis=0) / float(1 << (bps - 1))
    return x.astype(np.float32), sample_rate


def _decode_frame(
    payload: bytes, off: int, channels: int, bps: int, chans
) -> int:
    br = _MSBReader(payload, off * 8)
    sync = br.read(14)
    if sync != 0b11111111111110:
        raise ValueError("FLAC: lost frame sync")
    br.read(1)  # reserved
    br.read(1)  # blocking strategy
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    br.read(1)  # reserved
    _read_coded_number(br)
    if bs_code == 0:
        raise ValueError("FLAC: reserved block size code")
    elif bs_code == 6:
        blocksize = br.read(8) + 1
    elif bs_code == 7:
        blocksize = br.read(16) + 1
    else:
        blocksize = _BLOCKSIZE_CODES[bs_code]
    if sr_code == 12:
        br.read(8)
    elif sr_code in (13, 14):
        br.read(16)
    hdr_end_bits = br.pos
    if hdr_end_bits % 8:
        raise ValueError("FLAC: frame header not byte-aligned")
    crc8 = br.read(8)
    if _crc8(payload[off : hdr_end_bits // 8]) != crc8:
        raise ValueError("FLAC: frame header CRC-8 mismatch")
    if ss_code == 0:
        sbps = bps
    else:
        sbps = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}.get(ss_code)
        if sbps is None:
            raise ValueError("FLAC: reserved sample size code")
    if ch_code < 8:
        if ch_code + 1 != channels:
            raise ValueError("FLAC: channel count mismatch")
        subs = [
            _read_subframe(br, blocksize, sbps) for _ in range(channels)
        ]
    elif ch_code in (8, 9, 10):  # L/S, R/S, M/S — side gets +1 bit
        if channels != 2:
            raise ValueError("FLAC: stereo decorrelation needs 2 channels")
        if ch_code == 8:  # left/side
            left = _read_subframe(br, blocksize, sbps)
            side = _read_subframe(br, blocksize, sbps + 1)
            subs = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _read_subframe(br, blocksize, sbps + 1)
            right = _read_subframe(br, blocksize, sbps)
            subs = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side
            mid = _read_subframe(br, blocksize, sbps)
            side = _read_subframe(br, blocksize, sbps + 1)
            subs = [[], []]
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                subs[0].append((m + s) >> 1)
                subs[1].append((m - s) >> 1)
    else:
        raise ValueError("FLAC: reserved channel assignment")
    br.align()
    crc16 = br.read(16)
    if _crc16(payload[off : (br.pos - 16) // 8]) != crc16:
        raise ValueError("FLAC: frame CRC-16 mismatch")
    for c in range(channels):
        chans[c].extend(subs[c])
    return (br.pos + 7) // 8


# ---------------------------------------------------------------------------
# Fixture encoder: VERBATIM / FIXED(0-2) mono-or-stereo independent
# channels, real rice residuals, correct CRCs.
# ---------------------------------------------------------------------------


def _write_residual(bw: _MSBWriter, res: list[int], param: int) -> None:
    bw.write(0, 2)  # 4-bit rice method
    bw.write(0, 4)  # partition order 0
    bw.write(param, 4)
    for r in res:
        v = (r << 1) ^ (r >> 63) if r < 0 else r << 1
        v = (abs(r) << 1) - (1 if r < 0 else 0)
        q = v >> param
        for _ in range(q):
            bw.write(0, 1)
        bw.write(1, 1)
        bw.write(v & ((1 << param) - 1), param)


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 8000,
    bps: int = 16,
    blocksize: int = 256,
    fixed_order: int = 1,
) -> bytes:
    """Minimal conforming FLAC encoder (fixture twin): independent
    channels, FIXED(order) subframes with partition-order-0 rice
    residuals (VERBATIM when order exceeds the block), STREAMINFO with
    zeroed md5. samples: (n,) or (n, channels) int array within bps."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n, channels = s.shape
    out = bytearray(b"fLaC")
    si = _MSBWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 zeroed (decoder ignores)
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    for start in range(0, n, blocksize):
        blk = s[start : start + blocksize]
        bw = _MSBWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit blocksize-1 follows
        bw.write(0, 4)  # rate: from STREAMINFO
        bw.write(channels - 1, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        bw.write(0, 1)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0b110, 3)
            bw.write(frame_no >> 6, 5)
            bw.write(0b10, 2)
            bw.write(frame_no & 0x3F, 6)
        bw.write(len(blk) - 1, 16)
        hdr = bw.bytes()
        bw.write(_crc8(hdr), 8)
        for c in range(channels):
            ch = blk[:, c].tolist()
            order = fixed_order if len(ch) > fixed_order else 0
            bw.write(0, 1)
            bw.write(8 + order, 6)  # FIXED
            bw.write(0, 1)  # no wasted bits
            for w in ch[:order]:
                bw.write(w & ((1 << bps) - 1), bps)
            coefs = _FIXED_COEFS[order]
            res = []
            for i in range(order, len(ch)):
                pred = sum(
                    co * ch[i - 1 - j] for j, co in enumerate(coefs)
                )
                res.append(ch[i] - pred)
            maxa = max((abs(r) for r in res), default=0)
            param = 0
            while (1 << param) < maxa + 1 and param < 14:
                param += 1
            _write_residual(bw, res, param)
        bw.align()
        framed = bw.bytes()
        bw.write(_crc16(framed), 16)
        out += bw.bytes()
        frame_no += 1
    return bytes(out)
