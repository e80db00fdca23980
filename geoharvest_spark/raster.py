"""Raster ingestion: GeoTIFF-shaped TIFF decode + raster->vector cell
aggregation (the raster half of the north rule's raster<->vector tiling).

``decode_tiff`` is a pure stdlib+numpy baseline-TIFF reader (both byte
orders, 8-bit gray/RGB; uncompressed, PackBits, LZW, or Deflate strips;
horizontal predictor) that also
surfaces the GeoTIFF georeferencing tags (ModelPixelScale 33550 +
ModelTiepoint 33922) as an affine north-up geotransform. ``encode_tiff``
is the synthesis twin (uncompressed, little-endian, optional geo tags).

``raster_cell_stats`` is the scale-shaped raster->vector operator: each
raster decodes inside one Arrow batch, pixels map to ghcell ids with the
vectorized numpy twin of the engine's cell index, and the UDF emits
PER-RASTER PER-CELL PARTIAL AGGREGATES — a raster never leaves the task
as pixels, so the shuffle carries O(cells-touched) rows (bounded by the
grid, ~1e6 at res 7) regardless of raster resolution. The final
groupBy(cell) merges partials with a map-side combine, exactly the
two-stage aggregate a 100-TB raster table needs.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .index import ghcell_np

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}


def _packbits_decode(data: bytes, expect: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:  # copy n+1 literal bytes
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += data[i : i + 1] * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expect:
        raise ValueError("TIFF PackBits stream truncated")
    return bytes(out[:expect])


def _tiff_lzw_decode(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 LZW decode (Compression=5): MSB-first bit packing,
    9->12-bit codes with EARLY CHANGE — the ENCODER widens at next-free
    511/1023/2047, and the decoder (whose table lags one entry behind)
    at 510/1022/2046; getting either side of that pair wrong desyncs
    the stream at the first width boundary (the classic interop trap).
    Clear=256 resets the table, EOI=257 ends the strip."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = nbits = pos = 0
    table: dict[int, bytes] = {}
    width, next_code, prev = 9, 258, -1

    def _reset() -> None:
        nonlocal table, width, next_code, prev
        table = {i: bytes([i]) for i in range(256)}
        width, next_code, prev = 9, 258, -1

    _reset()
    while True:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF LZW stream truncated (no EOI)")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        # drop the consumed high bits: without this mask bitbuf grows into
        # a strip-sized bignum and every shift/or reallocates it — O(n^2),
        # measured 1.68 s -> 0.06 s per 64 KB strip (r8)
        bitbuf &= (1 << nbits) - 1
        if code == EOI:
            break
        if code == CLEAR:
            _reset()
            continue
        if prev < 0:
            if code > 255:
                raise ValueError("TIFF LZW: non-literal after Clear")
            s = table[code]
        elif code < next_code:
            s = table[code]
            table[next_code] = table[prev] + s[:1]
            next_code += 1
            # early change, decoder side: the decoder's table lags the
            # encoder's by ONE entry (no entry on the first code after
            # Clear), so it must widen one code earlier than the
            # encoder's 511/1023/2047 — at 510/1022/2046 (TIFF 6.0).
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
        elif code == next_code:
            s = table[prev] + table[prev][:1]
            table[next_code] = s
            next_code += 1
            if next_code == (1 << width) - 2 and width < 12:
                width += 1
        else:
            raise ValueError(f"TIFF LZW: code {code} beyond table")
        out += s
        prev = code
    if len(out) < expect:
        raise ValueError("TIFF LZW output short of strip size")
    return bytes(out[:expect])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF 6.0 LZW encode — exact inverse of _tiff_lzw_decode (same
    early-change width schedule; emits Clear when the table nears the
    12-bit ceiling). Exists to synthesize REAL payloads for tests."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    bitbuf = nbits = 0

    def _emit(code: int, w: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << w) | code
        nbits += w
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8
            bitbuf &= (1 << nbits) - 1  # same bignum-growth guard as decode

    def _fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = _fresh()
    width, next_code = 9, 258
    _emit(CLEAR, width)
    run = b""
    for b in data:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        _emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        run = bytes([b])
        if next_code >= 4093:  # spec: Clear before the early-change 4094
            _emit(CLEAR, width)
            table = _fresh()
            width, next_code = 9, 258
    if run:
        _emit(table[run], width)
    _emit(EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def decode_tiff(payload: bytes) -> tuple[np.ndarray, dict]:
    """Baseline TIFF decode -> (array, meta). Supports II/MM byte order,
    8-bit grayscale (photometric 0/1), RGB (2) and JPEG-YCbCr (6);
    uncompressed (1), PackBits (32773), LZW (5), Deflate (8/32946), or
    new-style JPEG (7, incl. the shared JPEGTables tag 347) strips;
    horizontal predictor (317=2); first IFD only. GeoTIFF ModelPixelScale /
    ModelTiepoint tags populate meta['geotransform'] =
    (lon0, sx, lat0, sy) with lon = lon0 + col*sx, lat = lat0 - row*sy
    (north-up). Malformed input raises ValueError; unsupported layouts
    raise NotImplementedError."""
    if payload[:4] == b"II*\x00":
        e = "<"
    elif payload[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ValueError("not a TIFF (bad byte-order/magic)")
    try:
        (ifd_off,) = struct.unpack(e + "I", payload[4:8])
        (n_entries,) = struct.unpack(
            e + "H", payload[ifd_off : ifd_off + 2]
        )
        tags: dict[int, tuple[int, int, bytes]] = {}
        for i in range(n_entries):
            o = ifd_off + 2 + 12 * i
            tag, typ, cnt = struct.unpack(e + "HHI", payload[o : o + 8])
            raw = payload[o + 8 : o + 12]
            size = _TYPE_SIZES.get(typ, 1) * cnt
            if size > 4:
                (off,) = struct.unpack(e + "I", raw)
                raw = payload[off : off + size]
            tags[tag] = (typ, cnt, raw)
    except struct.error as ex:
        raise ValueError(f"TIFF header truncated: {ex}") from ex

    def vals(tag, default=None):
        if tag not in tags:
            return default
        typ, cnt, raw = tags[tag]
        fmt = {1: "B", 3: "H", 4: "I", 12: "d"}.get(typ)
        if fmt is None:
            raise NotImplementedError(f"TIFF tag type {typ} not supported")
        try:
            return list(struct.unpack(e + fmt * cnt, raw[: _TYPE_SIZES[typ] * cnt]))
        except struct.error as ex:
            raise ValueError(f"TIFF tag {tag} truncated: {ex}") from ex

    w = vals(256)
    h = vals(257)
    if not w or not h:
        raise ValueError("TIFF missing ImageWidth/ImageLength")
    w, h = int(w[0]), int(h[0])
    bps = vals(258, [8])
    if any(int(b) != 8 for b in bps):
        raise NotImplementedError(f"{bps}-bit TIFF not supported")
    compression = int(vals(259, [1])[0])
    photometric = int(vals(262, [1])[0])
    spp = int(vals(277, [1])[0])
    if photometric == 2:
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples")
    elif photometric in (0, 1):
        if spp != 1:
            raise NotImplementedError("extra-sample grayscale TIFF")
    elif photometric == 6:
        # YCbCr is only meaningful for new-style JPEG strips (TIFF TN2):
        # the JPEG decoder returns RGB, so downstream treats it as RGB
        if compression != 7:
            raise NotImplementedError(
                "YCbCr TIFF without JPEG compression not supported"
            )
        if spp < 3:
            raise ValueError("YCbCr TIFF with <3 samples")
    else:
        raise NotImplementedError(f"TIFF photometric {photometric} not supported")
    offsets = vals(273)
    counts = vals(279)
    if not offsets or not counts or len(offsets) != len(counts):
        raise ValueError("TIFF missing/mismatched strip tables")
    rows_per_strip = int(vals(278, [h])[0])
    data = bytearray()
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        chunk = payload[int(off) : int(off) + int(cnt)]
        if len(chunk) < int(cnt):
            raise ValueError("TIFF strip truncated")
        if compression == 1:
            data += chunk
        elif compression == 32773:
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            data += _packbits_decode(chunk, n_rows * w * spp)
        elif compression == 5:
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            data += _tiff_lzw_decode(chunk, n_rows * w * spp)
        elif compression in (8, 32946):  # Adobe / legacy Deflate
            import zlib

            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            try:
                raw = zlib.decompress(chunk)
            except zlib.error as ex:
                raise ValueError(f"TIFF Deflate strip: {ex}") from ex
            if len(raw) < n_rows * w * spp:
                raise ValueError("TIFF Deflate strip short of size")
            data += raw[: n_rows * w * spp]
        elif compression == 7:
            # new-style JPEG (TIFF Tech Note 2): each strip is a full
            # JPEG stream; shared tables may live in the JPEGTables tag
            # (347) as an abbreviated SOI..tables..EOI stream whose body
            # is spliced after the strip's SOI
            from geoharvest_spark.multimodal import decode_jpeg

            tbl = b""
            if 347 in tags:
                traw = bytes(tags[347][2])
                if (
                    len(traw) >= 4
                    and traw[:2] == b"\xff\xd8"
                    and traw[-2:] == b"\xff\xd9"
                ):
                    tbl = traw[2:-2]
                else:
                    raise ValueError("TIFF JPEGTables malformed")
            if bytes(chunk[:2]) != b"\xff\xd8":
                raise ValueError("TIFF JPEG strip missing SOI")
            strip_img = decode_jpeg(b"\xff\xd8" + tbl + bytes(chunk[2:]))
            n_rows = min(rows_per_strip, h - si * rows_per_strip)
            if strip_img.shape[0] != n_rows or strip_img.shape[1] != w:
                raise ValueError(
                    f"TIFF JPEG strip dims {strip_img.shape[:2]} != "
                    f"({n_rows}, {w})"
                )
            if strip_img.ndim == 2:
                if spp != 1:
                    raise ValueError("gray JPEG strip in multi-sample TIFF")
                data += strip_img.tobytes()
            else:
                if spp < 3:
                    raise ValueError("color JPEG strip in 1-sample TIFF")
                data += np.ascontiguousarray(strip_img[:, :, :3]).tobytes()
        else:
            raise NotImplementedError(
                f"TIFF compression {compression} not supported"
            )
    need = h * w * spp
    if len(data) < need:
        raise ValueError("TIFF pixel data truncated")
    arr = np.frombuffer(bytes(data[:need]), dtype=np.uint8).reshape(h, w, spp)
    predictor = int(vals(317, [1])[0])
    if predictor == 2:
        # horizontal differencing: stored samples are per-channel row
        # deltas; reconstruct with a wrapping cumsum along columns
        arr = (np.cumsum(arr.astype(np.int64), axis=1) % 256).astype(
            np.uint8
        )
    elif predictor != 1:
        raise NotImplementedError(f"TIFF predictor {predictor}")
    if photometric == 0:  # WhiteIsZero: invert to the usual polarity
        arr = 255 - arr
    img = arr[:, :, 0] if spp == 1 else arr[:, :, :3]
    meta: dict = {"photometric": photometric, "compression": compression}
    scale = vals(33550)
    tie = vals(33922)
    if scale and tie and len(scale) >= 2 and len(tie) >= 5:
        # tiepoint (i, j, k, x, y, z): raster (i, j) pins world (x, y)
        i0, j0, _, x0, y0 = (float(v) for v in tie[:5])
        sx, sy = float(scale[0]), float(scale[1])
        meta["geotransform"] = (x0 - i0 * sx, sx, y0 + j0 * sy, sy)
    return img, meta


def encode_tiff(
    img: np.ndarray,
    pixel_scale: tuple[float, float] | None = None,
    tiepoint: tuple[float, float] | None = None,
    compression: int = 1,
    predictor: int = 1,
) -> bytes:
    """Minimal little-endian TIFF writer (8-bit gray or RGB, one strip)
    with optional GeoTIFF georeferencing (pixel_scale (sx, sy) +
    tiepoint (lon0, lat0) pinning raster (0,0)), LZW compression
    (``compression=5``), horizontal differencing (``predictor=2``), and
    new-style JPEG strips (``compression=7`` — the strip is one
    self-contained 4:4:4 JPEG; gray keeps photometric 1, color is
    written photometric 6/YCbCr per TIFF Tech Note 2)."""
    if compression not in (1, 5, 7, 8):
        raise ValueError(f"encode_tiff compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"encode_tiff predictor {predictor}")
    if compression == 7 and predictor == 2:
        raise ValueError("predictor is not defined for JPEG strips")
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    spp = 1 if gray else 3
    samples = (img[:, :, None] if gray else img[:, :, :3]).astype(np.int16)
    if predictor == 2:
        d = samples.copy()
        d[:, 1:] = (samples[:, 1:] - samples[:, :-1]) % 256
        samples = d
    body = samples.astype(np.uint8).tobytes()
    if compression == 5:
        body = _tiff_lzw_encode(body)
    elif compression == 8:
        import zlib

        body = zlib.compress(body, 6)
    elif compression == 7:
        from geoharvest_spark.multimodal import encode_jpeg

        body = encode_jpeg(
            img if gray else img[:, :, :3], quality=95, subsample="444"
        )

    entries = []  # (tag, type, count, value_or_bytes)

    def short(tag, v):
        entries.append((tag, 3, 1, struct.pack("<HH", v, 0)))

    def long_(tag, v):
        entries.append((tag, 4, 1, struct.pack("<I", v)))

    geo = pixel_scale is not None and tiepoint is not None
    # 9 base entries (BitsPerSample is 1 either way) + geo + predictor
    n = 9 + (2 if geo else 0) + (1 if predictor == 2 else 0)
    header_size = 8 + 2 + 12 * n + 4
    extra = b""
    extra_off = header_size
    data_off = None

    short(256, w)
    short(257, h)
    if gray:
        short(258, 8)
    else:
        entries.append(
            (258, 3, 3, struct.pack("<I", 0))
        )  # patched below (needs extra area)
    short(259, compression)
    short(262, 1 if gray else (6 if compression == 7 else 2))
    long_(273, 0)  # patched
    short(277, spp)
    long_(278, h)
    long_(279, len(body))
    if predictor == 2:
        short(317, 2)
    if geo:
        entries.append((33550, 12, 3, struct.pack("<I", 0)))  # patched
        entries.append((33922, 12, 6, struct.pack("<I", 0)))  # patched
    entries.sort(key=lambda t: t[0])

    patched = []
    for tag, typ, cnt, raw in entries:
        if tag == 258 and not gray:
            raw = struct.pack("<I", extra_off + len(extra))
            extra += struct.pack("<HHH", 8, 8, 8) + b"\x00\x00"
        elif tag == 33550:
            raw = struct.pack("<I", extra_off + len(extra))
            extra += struct.pack("<ddd", pixel_scale[0], pixel_scale[1], 0.0)
        elif tag == 33922:
            raw = struct.pack("<I", extra_off + len(extra))
            extra += struct.pack(
                "<dddddd", 0.0, 0.0, 0.0, tiepoint[0], tiepoint[1], 0.0
            )
        patched.append((tag, typ, cnt, raw))
    data_off = extra_off + len(extra)
    out = bytearray(b"II*\x00" + struct.pack("<I", 8))
    out += struct.pack("<H", len(patched))
    for tag, typ, cnt, raw in patched:
        if tag == 273:
            raw = struct.pack("<I", data_off)
        out += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")[:4]
    out += struct.pack("<I", 0)  # no next IFD
    assert len(out) == extra_off, (len(out), extra_off)
    out += extra + body
    return bytes(out)


def raster_cell_stats(
    df: DataFrame,
    res: int = 5,
    payload_col: str = "payload",
) -> DataFrame:
    """Raster -> vector cell aggregation: decode each GeoTIFF payload,
    map every pixel center to its ghcell at ``res`` via the geotransform,
    and aggregate (n_pixels, sum_val) per cell — partials computed in
    numpy INSIDE the batch (np.unique + bincount over the cell ids), so
    the shuffle sees per-(raster, cell) rows, never pixels. Undecodable
    or un-georeferenced payloads are skipped (the divert-not-crash
    contract). Returns (cell, n_pixels, sum_val)."""

    def _map(batches):
        for pdf in batches:
            cells_all = []
            for payload in pdf[payload_col]:
                try:
                    img, meta = decode_tiff(bytes(payload))
                except (ValueError, NotImplementedError):
                    continue
                gt = meta.get("geotransform")
                if gt is None:
                    continue
                lon0, sx, lat0, sy = gt
                h, w = img.shape[:2]
                # GeoTIFF tiepoints are PixelIsArea (upper-left CORNER of
                # pixel 0,0) — the +0.5 offset maps each pixel CENTER to
                # its cell, as the docstring promises.
                lon = lon0 + (np.arange(w, dtype=np.float64) + 0.5) * sx
                lat = lat0 - (np.arange(h, dtype=np.float64) + 0.5) * sy
                cell = ghcell_np(
                    np.broadcast_to(lon[None, :], (h, w)).reshape(-1),
                    np.broadcast_to(lat[:, None], (h, w)).reshape(-1),
                    res,
                )
                val = (
                    img.astype(np.int64)
                    if img.ndim == 2
                    else img[:, :, 0].astype(np.int64)
                ).reshape(-1)
                uniq, inv = np.unique(cell, return_inverse=True)
                n = np.bincount(inv)
                sv = np.bincount(inv, weights=val).astype(np.int64)
                cells_all.append(
                    pd.DataFrame(
                        {"cell": uniq, "n_pixels": n, "sum_val": sv}
                    )
                )
            yield (
                pd.concat(cells_all)
                if cells_all
                else pd.DataFrame(
                    {
                        "cell": np.array([], dtype=np.int64),
                        "n_pixels": np.array([], dtype=np.int64),
                        "sum_val": np.array([], dtype=np.int64),
                    }
                )
            )

    partial = df.mapInPandas(
        _map, "cell long, n_pixels long, sum_val long"
    )
    return partial.groupBy("cell").agg(
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("sum_val").alias("sum_val"),
    )


def raster_tile_pyramid(
    cell_stats: DataFrame,
    resolutions: tuple[int, ...] = (5, 6, 7),
) -> DataFrame:
    """Raster tile materialization: roll the finest-level raster cell
    aggregates (output of ``raster_cell_stats`` at ``max(resolutions)``)
    up the tile pyramid. Same single-linear-plan ancestor explode as
    tiles.tile_pyramid_counts_rollup — one pass over the (bounded)
    finest cell table, weighted sums instead of point counts; exactness
    rests on the same aperture-4 floor-commute property the point
    pyramid proves. Returns (res, cell, n_pixels, sum_val)."""
    from .index import ghcell_parent

    rs = sorted(resolutions)
    finest = rs[-1]
    anc = F.array(
        *[
            F.struct(
                F.lit(r).alias("res"),
                (
                    F.col("cell")
                    if r == finest
                    else ghcell_parent(F.col("cell"), r, finest)
                ).alias("acell"),
            )
            for r in rs
        ]
    )
    return (
        cell_stats.select(F.explode(anc).alias("_a"), "n_pixels", "sum_val")
        .groupBy(F.col("_a.res").alias("res"), F.col("_a.acell").alias("cell"))
        .agg(
            F.sum("n_pixels").alias("n_pixels"),
            F.sum("sum_val").alias("sum_val"),
        )
    )


def raster_zonal_stats(
    rasters: DataFrame,
    zones: DataFrame,
    res: int = 7,
    pip_res: int = 5,
    payload_col: str = "payload",
    rows_per_task: int = 200_000,
) -> DataFrame:
    """Zonal statistics — the raster x vector join (VERDICT r5 #3): per
    polygon, aggregate the raster pixels whose containing res-``res``
    cell CENTER falls inside the polygon (the standard center-rule
    rasterization of zone membership).

    Composition, never pixels on the wire: ``raster_cell_stats`` first
    reduces pixels to per-cell partials inside the Arrow batch (the
    shuffle sees cells, not pixels), cell centers then join the zones
    through the salted broadcast-free PIP machinery (cover-cell
    equi-join at ``pip_res`` + codegen bbox prefilter + Arrow ray-cast
    refine — same skew contract as pip_join), and one final hash
    aggregate per zone emits the stats. At 100 TB the pixel->cell
    reduction is the whole game: a 10^12-pixel raster set becomes at
    most ~8.4M res-7 cell rows before anything shuffles.

    ``pip_res`` controls the zone cover-cell granularity independently
    of the stats resolution ``res`` (coarse cover keeps the zone
    explode small; the ray-cast refine restores exactness either way).

    Cell centers are exact binary doubles: the ghcell step at res r is
    45/2^r (exactly representable), so ``(x + 0.5) * step - 180`` is
    bit-identical between the engine and a SQL oracle.

    Returns (poly_id, n_cells, n_pixels, sum_val, mean_val) where
    mean_val = sum_val / n_pixels as one double division."""
    from .index import GHCELL_RES_BITS, GHCELL_X_BITS, ghcell_nx, ghcell_ny
    from .joins import pip_join

    cells = raster_cell_stats(rasters, res=res, payload_col=payload_col)
    step_x = 360.0 / ghcell_nx(res)
    step_y = 180.0 / ghcell_ny(res)
    rem = F.col("cell") % F.lit(GHCELL_RES_BITS)
    x = (rem / F.lit(GHCELL_X_BITS)).cast("long")
    y = (rem % F.lit(GHCELL_X_BITS)).cast("long")
    pts = cells.select(
        F.col("cell").alias("point_id"),
        ((x + F.lit(0.5)) * F.lit(step_x) - F.lit(180.0)).alias("lon"),
        ((y + F.lit(0.5)) * F.lit(step_y) - F.lit(90.0)).alias("lat"),
        "n_pixels",
        "sum_val",
    )
    j = pip_join(
        pts, zones, res=pip_res, point_key="point_id",
        rows_per_task=rows_per_task,
    )
    return j.groupBy("poly_id").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum("n_pixels").alias("n_pixels"),
        F.sum("sum_val").alias("sum_val"),
        (
            F.sum("sum_val").cast("double")
            / F.sum("n_pixels").cast("double")
        ).alias("mean_val"),
    )
