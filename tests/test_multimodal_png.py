"""Pure-stdlib PNG codec tests: round-trip through every scanline filter
and supported color type, plumbing dispatch, and honest gates for the
unsupported corners (VERDICT r2 item 5)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from geoharvest_spark.multimodal import (
    FEATURE_DIM,
    _image_features,
    decode_features,
    decode_png,
    encode_png,
    png_features,
    synth_png,
)


def _rand_img(seed: int, h: int, w: int, ch: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    a = rs.randint(0, 256, size=(h, w, ch), dtype=np.uint8)
    return a[:, :, 0] if ch == 1 else a


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(filt):
    img = _rand_img(10 + filt, 13, 17, 3)
    out = decode_png(encode_png(img, filters=[filt]))
    assert out.shape == (13, 17, 3)
    assert (out == img).all()


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_color_types(ch):
    img = _rand_img(50 + ch, 9, 11, ch)
    out = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4]))
    want = img[:, :, None] if ch == 1 else img
    assert out.shape == want.shape
    assert (out == want).all()


def test_png_gradient_all_filters_mixed():
    # smooth gradients make filters 3/4 predict well — exercises the
    # nontrivial average/paeth reconstruction, not just noise
    y, x = np.mgrid[0:20, 0:30]
    img = np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=2
    ).astype(np.uint8)
    out = decode_png(encode_png(img, filters=[4, 3, 2, 1, 0]))
    assert (out == img).all()


def test_png_palette_decodes():
    # hand-build a palette (color type 3) PNG: 4x2, 3 palette entries
    plte = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2, 1], [2, 2, 0, 1]], dtype=np.uint8)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte.tobytes())
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    out = decode_png(payload)
    assert out.shape == (2, 4, 3)
    assert (out == plte[idx]).all()


def test_png_unsupported_gates():
    img = _rand_img(1, 4, 4, 3)
    good = encode_png(img)
    # not a PNG
    with pytest.raises(ValueError):
        decode_png(b"JUNK" + good[4:])
    # sub-byte depth: patch IHDR depth byte (offset 8+4+4+8 = data byte 8)
    deep = bytearray(good)
    deep[24] = 4
    with pytest.raises(NotImplementedError):
        decode_png(bytes(deep))
    # interlace byte lying about the layout -> data-length mismatch error
    inter = bytearray(good)
    inter[28] = 1
    with pytest.raises(ValueError):
        decode_png(bytes(inter))


@pytest.mark.parametrize("shape", [(24, 32), (13, 17), (7, 5), (1, 1), (2, 9)])
def test_png_adam7_roundtrip(shape):
    """Adam7 interlaced round-trip at shapes that exercise empty and
    partial passes (1x1 leaves only pass 1; odd dims hit ceil paths)."""
    h, w = shape
    img = _rand_img(h * 100 + w, h, w, 3)
    out = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4], interlace=True))
    assert (out == img).all()


def test_png_adam7_16bit_and_rgba():
    rs = np.random.RandomState(77)
    img16 = rs.randint(0, 65536, size=(11, 14), dtype=np.uint16)
    out16 = decode_png(encode_png(img16, filters=[4, 3, 2, 1, 0], interlace=True))
    assert (out16[:, :, 0] == img16).all()
    rgba = rs.randint(0, 256, size=(9, 6, 4), dtype=np.uint8)
    out = decode_png(encode_png(rgba, filters=[2, 4], interlace=True))
    assert (out == rgba).all()


def test_png_adam7_matches_noninterlaced():
    img = _rand_img(123, 16, 16, 3)
    a = decode_png(encode_png(img, interlace=True))
    b = decode_png(encode_png(img, interlace=False))
    assert (a == b).all()


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_16bit_roundtrip(ch):
    rs = np.random.RandomState(90 + ch)
    a = rs.randint(0, 65536, size=(7, 9, ch), dtype=np.uint16)
    img = a[:, :, 0] if ch == 1 else a
    out = decode_png(encode_png(img, filters=[0, 1, 2, 3, 4]))
    want = img[:, :, None] if ch == 1 else img
    assert out.dtype == np.uint16
    assert (out == want).all()


def test_png_16bit_features_scale_to_8bit_domain():
    rs = np.random.RandomState(5)
    img8 = rs.randint(0, 256, size=(10, 12, 3), dtype=np.uint8)
    img16 = (img8.astype(np.uint16) * 257)  # exact 8->16 bit expansion
    f8 = _image_features(img8)
    f16 = _image_features(img16)
    assert f8 == pytest.approx(f16, abs=1e-6)


def test_png_features_dispatch_real_not_stub():
    payload = synth_png(7)
    feats = decode_features("image", payload, FEATURE_DIM)
    assert feats == png_features(payload, FEATURE_DIM)
    # histogram + stats of the REAL pixel array, not the md5 stub
    assert feats == _image_features(decode_png(payload), FEATURE_DIM)
    hist = np.array(feats[:16])
    assert abs(hist.sum() - 1.0) < 1e-6  # 16-bin histogram normalizes to 1


def test_media_table_runs_png_end_to_end(spark):
    from geoharvest_spark.multimodal import synth_media_df, with_media_features

    out = with_media_features(synth_media_df(spark, 24)).toPandas()
    pngs = out[out.meta.apply(lambda m: m["mime"] == "image/png")]
    assert len(pngs) > 0
    for r in pngs.itertuples():
        assert list(r.features) == pytest.approx(
            png_features(bytes(r.payload), FEATURE_DIM)
        )


def test_resize_image_nearest_neighbor_rule():
    from geoharvest_spark.multimodal import resize_image

    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    out = resize_image(img, 4, 3)
    assert out.shape == (4, 3, 3)
    # src index = floor(dst * src/dst): rows 0,2,4,6; cols 0,2,4
    assert (out == img[[0, 2, 4, 6]][:, [0, 2, 4]]).all()
    up = resize_image(img, 16, 12)  # upscale duplicates pixels
    assert up.shape == (16, 12, 3)
    assert (up[0::2, 0::2] == img).all()


def test_with_resized_images_plumbing(spark):
    from geoharvest_spark.multimodal import (
        decode_png,
        synth_media_df,
        with_resized_images,
    )

    out = with_resized_images(synth_media_df(spark, 12), 12, 16).toPandas()
    imgs = out[out.kind == "image"]
    others = out[out.kind != "image"]
    assert imgs.resized.notna().all()  # every PPM/PNG row resized
    assert others.resized.isna().all()  # pass-through rows untouched
    for r in imgs.itertuples():
        dec = decode_png(bytes(r.resized))
        assert dec.shape == (12, 16, 3)

# ---------------------------------------------------------------------------
# round-5 codec-gate closures: PNM P2/P3/P5, WAV 24/32-bit, sub-byte PNG
# ---------------------------------------------------------------------------
def _png_chunks(*chunks):
    import struct
    import zlib as z

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    for ctype, data in chunks:
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", z.crc32(ctype + data) & 0xFFFFFFFF)
    return bytes(out)


def _pack_bits(vals, depth, width):
    """Spec packing: depth-bit samples MSB-first, scanline-padded."""
    import numpy as np

    rows = []
    for r in range(0, len(vals), width):
        row = vals[r : r + width]
        bits = []
        for v in row:
            bits.extend((v >> (depth - 1 - k)) & 1 for k in range(depth))
        while len(bits) % 8:
            bits.append(0)
        rows.append(np.packbits(np.array(bits, dtype=np.uint8)).tobytes())
    return rows


def test_png_subbyte_gray_depths():
    import struct
    import zlib as z

    import numpy as np

    from geoharvest_spark.multimodal import decode_png

    for depth in (1, 2, 4):
        w, h = 5, 3
        maxv = (1 << depth) - 1
        vals = [(x * y + x) % (maxv + 1) for y in range(h) for x in range(w)]
        scan = b"".join(b"\x00" + r for r in _pack_bits(vals, depth, w))
        png = _png_chunks(
            (b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)),
            (b"IDAT", z.compress(scan)),
            (b"IEND", b""),
        )
        img = decode_png(png)
        assert img.shape == (h, w, 1)
        expect = (
            np.array(vals).reshape(h, w) * 255 // maxv
        ).astype(np.uint8)
        assert np.array_equal(img[:, :, 0], expect), depth


def test_png_subbyte_palette_and_filters():
    import struct
    import zlib as z

    import numpy as np

    from geoharvest_spark.multimodal import decode_png

    # 2-bit palette, 4 colors, filter types exercised on the byte level
    w, h = 7, 4
    vals = [(x + y) % 4 for y in range(h) for x in range(w)]
    rows = _pack_bits(vals, 2, w)
    # filter 0 then filter 2 (Up) on the remaining rows
    scan = bytearray(b"\x00" + rows[0])
    prev = np.frombuffer(rows[0], dtype=np.uint8).astype(np.int32)
    for r in rows[1:]:
        cur = np.frombuffer(r, dtype=np.uint8).astype(np.int32)
        scan += b"\x02" + ((cur - prev) & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    plte = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255])
    png = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", w, h, 2, 3, 0, 0, 0)),
        (b"PLTE", plte),
        (b"IDAT", z.compress(bytes(scan))),
        (b"IEND", b""),
    )
    img = decode_png(png)
    assert img.shape == (h, w, 3)
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(4, 3)
    expect = pal[np.array(vals).reshape(h, w)]
    assert np.array_equal(img, expect)


def test_png_subbyte_adam7():
    import struct
    import zlib as z

    import numpy as np

    from geoharvest_spark.multimodal import (
        _ADAM7,
        decode_png,
    )

    # 1-bit gray 9x9 checkerboard, Adam7: pack each pass per the spec
    w = h = 9
    full = np.fromfunction(lambda y, x: (x + y) % 2, (h, w), dtype=int)
    scan = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = full[y0:h:dy, x0:w:dx]
        if sub.size == 0:
            continue
        for row in sub:
            packed = _pack_bits(list(row), 1, len(row))[0]
            scan += b"\x00" + packed
    png = _png_chunks(
        (b"IHDR", struct.pack(">IIBBBBB", w, h, 1, 0, 0, 0, 1)),
        (b"IDAT", z.compress(bytes(scan))),
        (b"IEND", b""),
    )
    img = decode_png(png)
    assert img.shape == (h, w, 1)
    assert np.array_equal(img[:, :, 0], (full * 255).astype(np.uint8))


def test_pnm_variants_decode():
    import numpy as np

    from geoharvest_spark.multimodal import decode_image, decode_ppm

    # P5 binary grayscale
    p5 = b"P5\n# c\n3 2\n255\n" + bytes(range(6))
    g = decode_ppm(p5)
    assert g.shape == (2, 3) and g.tolist() == [[0, 1, 2], [3, 4, 5]]
    # P2 ascii grayscale with comment + maxval rescale (15 -> 255)
    p2 = b"P2\n3 1\n15\n0 7 15 # trailing comment\n"
    g2 = decode_ppm(p2)
    assert g2.tolist() == [[0, 119, 255]]  # (7*255+7)//15 = 119
    # P3 ascii color
    p3 = b"P3 2 1 255  255 0 0  0 255 0\n"
    c = decode_ppm(p3)
    assert c.shape == (1, 2, 3)
    assert c[0, 0].tolist() == [255, 0, 0] and c[0, 1].tolist() == [0, 255, 0]
    # decode_image dispatches all PNM magics
    assert decode_image(p5).shape == (2, 3)
    # errors: truncation and over-maxval stay ValueError
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_ppm(b"P2\n3 1\n15\n0 7\n")
    with _pytest.raises(ValueError):
        decode_ppm(b"P2\n2 1\n15\n0 16\n")
    with _pytest.raises(NotImplementedError):
        decode_ppm(b"P4\n2 1\n0")


def test_wav_24_and_32_bit_pcm():
    import io
    import wave

    import numpy as np

    from geoharvest_spark.multimodal import decode_wav

    def wav_bytes(width, frames):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wv:
            wv.setnchannels(1)
            wv.setsampwidth(width)
            wv.setframerate(16000)
            wv.writeframes(frames)
        return buf.getvalue()

    # 24-bit: values -2^23, -1, 0, 1, 2^23-1 little-endian
    def le24(v):
        return int(v & 0xFFFFFF).to_bytes(3, "little")

    samples = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
    x, rate = decode_wav(wav_bytes(3, b"".join(le24(s) for s in samples)))
    assert rate == 16000
    expect = np.array(samples) / 8388608.0
    assert np.allclose(x, expect)
    # 32-bit int PCM
    s32 = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype=np.int32)
    x2, _ = decode_wav(wav_bytes(4, s32.astype("<i4").tobytes()))
    assert np.allclose(x2, s32 / 2147483648.0)
