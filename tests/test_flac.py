"""FLAC codec: encoder round-trips (rice/FIXED/CRC paths), hand-built
frames for LPC and stereo decorrelation, and error boundaries."""

from __future__ import annotations

import numpy as np
import pytest

from geoharvest_spark.flac import (
    _crc8,
    _crc16,
    _MSBWriter,
    decode_flac,
    encode_flac,
)


def _sig(n, seed=3, amp=3000):
    rng = np.random.RandomState(seed)
    # smooth-ish signal so FIXED predictors leave small residuals
    base = (amp * np.sin(np.arange(n) / 9.0)).astype(np.int64)
    return base + rng.randint(-40, 41, n)


def test_roundtrip_fixed_orders_mono():
    x = _sig(1000)
    for order in (0, 1, 2):
        payload = encode_flac(x, sample_rate=8000, fixed_order=order)
        out, rate = decode_flac(payload)
        assert rate == 8000 and len(out) == 1000
        assert np.allclose(out, x / 32768.0, atol=1e-7), order


def test_roundtrip_stereo_and_multiblock():
    left = _sig(700, seed=1)
    right = _sig(700, seed=2)
    payload = encode_flac(
        np.stack([left, right], axis=1), blocksize=256, fixed_order=2
    )
    out, rate = decode_flac(payload)
    want = (left + right) / 2.0 / 32768.0
    assert np.allclose(out, want, atol=1e-7)


def test_roundtrip_negative_and_constantish():
    x = np.full(300, -12345, np.int64)
    x[250:] = 7
    out, _ = decode_flac(encode_flac(x, fixed_order=1))
    assert np.allclose(out, x / 32768.0, atol=1e-7)


def test_crc_detects_corruption():
    payload = bytearray(encode_flac(_sig(300)))
    payload[-3] ^= 0x40  # flip a bit in the last frame's data
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(payload))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def _handbuilt_frame(channels_bits, ch_code, channels, blocksize, bps=16):
    """Wrap hand-written subframe bit closures into a full stream."""
    si = _MSBWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(blocksize, 36)
    head = b"fLaC" + bytes([0x80]) + (len(si.bytes()) + 16).to_bytes(3, "big") \
        + si.bytes() + b"\x00" * 16
    bw = _MSBWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)   # explicit 16-bit blocksize
    bw.write(0, 4)
    bw.write(ch_code, 4)
    bw.write(4, 3)   # 16-bit
    bw.write(0, 1)
    bw.write(0, 8)   # frame 0
    bw.write(blocksize - 1, 16)
    bw.write(_crc8(bw.bytes()), 8)
    channels_bits(bw)
    bw.align()
    framed = bw.bytes()
    bw.write(_crc16(framed), 16)
    return head + bw.bytes()


def test_handbuilt_lpc_subframe():
    # order-1 LPC with coef=2, shift=1: pred = (2*prev)>>1 = prev —
    # equivalent to FIXED(1), so expected samples are easy to compute
    warm = 100
    res = [3, -2, 5]

    def bits(bw):
        bw.write(0, 1)
        bw.write(32, 6)        # LPC order 1 (32 + order-1)
        bw.write(0, 1)         # no wasted bits
        bw.write(warm & 0xFFFF, 16)
        bw.write(3, 4)         # precision-1 -> 4 bits
        bw.write(1, 5)         # shift 1
        bw.write(2, 4)         # coef +2
        bw.write(0, 2)         # rice method 0
        bw.write(0, 4)         # partition order 0
        bw.write(2, 4)         # rice param 2
        for r in res:
            v = (abs(r) << 1) - (1 if r < 0 else 0)
            for _ in range(v >> 2):
                bw.write(0, 1)
            bw.write(1, 1)
            bw.write(v & 3, 2)

    payload = _handbuilt_frame(bits, ch_code=0, channels=1, blocksize=4)
    out, _ = decode_flac(payload)
    want = [100, 103, 101, 106]
    assert np.allclose(out * 32768.0, want, atol=1e-3)


def test_handbuilt_mid_side():
    # 2 samples: L = [10, 20], R = [4, 6] -> mid = (L+R)>>1, side = L-R
    L = [10, 20]
    R = [4, 6]
    mids = [(l + r) >> 1 for l, r in zip(L, R)]
    sides = [l - r for l, r in zip(L, R)]

    def verb(bw, vals, bits):
        bw.write(0, 1)
        bw.write(1, 6)  # VERBATIM
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << bits) - 1), bits)

    def bits(bw):
        verb(bw, mids, 16)        # mid at bps
        verb(bw, sides, 17)       # side at bps+1

    payload = _handbuilt_frame(bits, ch_code=10, channels=2, blocksize=2)
    out, _ = decode_flac(payload)
    want = [(l + r) / 2.0 / 32768.0 for l, r in zip(L, R)]
    assert np.allclose(out, want, atol=1e-7)


def test_handbuilt_left_side_and_right_side():
    L = [100, -50]
    R = [40, -80]
    sides = [l - r for l, r in zip(L, R)]

    def verb(bw, vals, bits):
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in vals:
            bw.write(v & ((1 << bits) - 1), bits)

    def ls_bits(bw):
        verb(bw, L, 16)
        verb(bw, sides, 17)

    def rs_bits(bw):
        verb(bw, sides, 17)
        verb(bw, R, 16)

    for bits, code in ((ls_bits, 8), (rs_bits, 9)):
        payload = _handbuilt_frame(bits, ch_code=code, channels=2, blocksize=2)
        out, _ = decode_flac(payload)
        want = [(l + r) / 2.0 / 32768.0 for l, r in zip(L, R)]
        assert np.allclose(out, want, atol=1e-7), code


def test_handbuilt_constant_and_wasted_bits():
    def bits(bw):
        bw.write(0, 1)
        bw.write(0, 6)   # CONSTANT
        bw.write(1, 1)   # wasted-bits flag
        bw.write(1, 1)   # unary 0 -> wasted = 1
        bw.write(21 & 0x7FFF, 15)  # value at bps-wasted

    payload = _handbuilt_frame(bits, ch_code=0, channels=1, blocksize=3)
    out, _ = decode_flac(payload)
    assert np.allclose(out * 32768.0, [42, 42, 42], atol=1e-3)


def test_flac_feeds_the_audio_feature_path(spark):
    # same signal via WAV PCM and FLAC must produce the SAME features
    # (shared kernel; FLAC is lossless)
    import struct

    import numpy as np

    from geoharvest_spark.multimodal import decode_features

    x = _sig(2000, seed=9)
    pcm = x.astype("<i2").tobytes()
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    f_wav = decode_features("audio", wav, 64)
    f_flac = decode_features("audio", encode_flac(x, 8000), 64)
    assert np.allclose(f_wav, f_flac, atol=1e-6)
    # corrupted flac diverts to the deterministic fake, not a crash
    bad = bytearray(encode_flac(x, 8000))
    bad[-3] ^= 0x40
    f_bad = decode_features("audio", bytes(bad), 64)
    assert len(f_bad) == 64 and not np.allclose(f_bad, f_flac, atol=1e-3)
