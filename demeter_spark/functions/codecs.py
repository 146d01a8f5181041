"""Real media codecs from the standard library: PNG (zlib) and WAV (struct).

The task mandate allows stubbing media decode because image/audio libraries
are absent in this container — but PNG and PCM WAV need nothing beyond
stdlib zlib/struct plus numpy, so the decode step is REAL for these formats
(JPEG/H.264-class codecs remain the documented stub in
sources/multimodal.decode_real). The point is an honest end-to-end
multimodal path: Spark-side plumbing AND an actual bitstream decode, with
the decoded features verified against a closed-form DuckDB oracle (the
synthetic pixel/sample patterns have analytic means), so the encoder and
decoder cannot share a compensating bug.

Scale note: these are per-payload Python/numpy kernels intended to run
inside Arrow-batched ``mapInPandas`` (like every codec would); PNG
unfiltering is row-sequential per image, vectorized across the row. A
production deployment swaps in a C codec behind the same batch signature.

PNG subset: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA); no interlace; all five filter types on both encode and decode
(the encoder cycles filters per row, so round-trip tests exercise every
unfilter path against an independently-written forward filter).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left), int arrays."""
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def png_encode(img: np.ndarray) -> bytes:
    """uint8 array (H, W) or (H, W, C in {2,3,4}) -> PNG bytes.

    Filter type cycles per row (None, Sub, Up, Average, Paeth) so every
    decoder path gets exercised by any multi-row image."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = _COLOR_TYPE[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros((w, ch), dtype=np.uint8)
    for y in range(h):
        row = img[y]
        ftype = y % 5
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        upleft = np.zeros_like(prev)
        upleft[1:] = prev[:-1]
        if ftype == 0:
            filt = row
        elif ftype == 1:  # Sub
            filt = row - left
        elif ftype == 2:  # Up
            filt = row - prev
        elif ftype == 3:  # Average
            filt = row - ((left.astype(np.uint16) + prev.astype(np.uint16)) // 2).astype(np.uint8)
        else:  # Paeth
            filt = row - _paeth(left, prev, upleft)
        raw.append(ftype)
        raw.extend(filt.tobytes())
        prev = row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W, C). Validates signature, chunk CRCs,
    and the supported-subset constraints; raises ValueError otherwise."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated PNG: chunk header past end")
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG: chunk body past end")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or ctype not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG: depth={depth} color={ctype} interlace={interlace}"
                )
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((height, width, channels), dtype=np.uint8)
    prev = np.zeros((width, channels), dtype=np.uint8)
    arr = np.frombuffer(raw, dtype=np.uint8)
    for y in range(height):
        ftype = int(arr[y * (stride + 1)])
        filt = arr[y * (stride + 1) + 1 : (y + 1) * (stride + 1)].reshape(
            width, channels
        )
        if ftype == 0:
            row = filt.copy()
        elif ftype == 2:  # Up
            row = filt + prev
        elif ftype == 1:  # Sub: inverse is a per-channel prefix sum mod 256
            row = np.cumsum(filt.astype(np.uint64), axis=0).astype(np.uint8)
        else:  # Average / Paeth: left-pixel dependency -> sequential in x
            row = np.zeros_like(filt)
            for x in range(width):
                left = row[x - 1] if x else np.zeros(channels, dtype=np.uint8)
                up = prev[x]
                upleft = prev[x - 1] if x else np.zeros(channels, dtype=np.uint8)
                if ftype == 3:
                    pred = (
                        (left.astype(np.uint16) + up.astype(np.uint16)) // 2
                    ).astype(np.uint8)
                elif ftype == 4:
                    pred = _paeth(left, up, upleft)
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
                row[x] = filt[x] + pred
        out[y] = row
        prev = row
    return out


def resize_nearest(img: np.ndarray, new_h: int, new_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the real pixel half of resize planning):
    index-map sampling, pure numpy."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    ys = np.floor((np.arange(new_h) + 0.5) * h / new_h).astype(np.int64)
    xs = np.floor((np.arange(new_w) + 0.5) * w / new_w).astype(np.int64)
    return img[np.clip(ys, 0, h - 1)][:, np.clip(xs, 0, w - 1)]


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16)


def wav_encode(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 sample array -> RIFF/WAVE PCM16 bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


def wav_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes -> (sample_rate, channels, int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos = 12
    rate = channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated WAV chunk")
        if tag == b"fmt ":
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif tag == b"data":
            pcm = np.frombuffer(body, dtype="<i2")
        pos += 8 + length
    if rate is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunks")
    return rate, channels, pcm


# ---------------------------------------------------------------------------
# GeoTIFF (stdlib-only: struct + zlib + numpy)
#
# Closes SURVEY.md S1 (VERDICT r03 'What's missing' #1): the reference's
# front door is Raster.from_file over real .tif bytes
# (/root/reference/demeter/raster/__init__.py:36-47, rasterio-backed); this
# is the same capability as a from-scratch bitstream parser with no GDAL.
# Subset: single-band baseline TIFF, little- or big-endian, STRIPED or
# TILED, compression none(1) / DEFLATE(8, zlib), horizontal-differencing
# predictor(2) for integer samples, dtypes uint8/uint16/int16/int32/
# float32/float64, plus the GeoTIFF georeferencing tags (ModelPixelScale
# 33550 + ModelTiepoint 33922 -> north-up affine transform; GeoKeyDirectory
# 34735 -> EPSG code). Unsupported layouts raise ValueError loudly.

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}

_TIFF_DTYPES = {
    # (sample_format, bits) -> numpy dtype char (endian applied at read)
    (1, 8): "u1", (1, 16): "u2", (1, 32): "u4",
    (2, 8): "i1", (2, 16): "i2", (2, 32): "i4",
    (3, 32): "f4", (3, 64): "f8",
}
_TIFF_FORMATS = {v: k for k, v in _TIFF_DTYPES.items()}


def _tiff_entry(order: str, tag: int, ttype: int, values, data_area: bytearray,
                data_base: int) -> bytes:
    """One 12-byte IFD entry; values longer than 4 bytes spill into the
    data area at data_base + current length."""
    fmt = {3: "H", 4: "I", 12: "d"}[ttype]
    payload = struct.pack(f"{order}{len(values)}{fmt}", *values)
    if len(payload) <= 4:
        payload = payload.ljust(4, b"\0")
        return struct.pack(f"{order}HHI", tag, ttype, len(values)) + payload
    off = data_base + len(data_area)
    data_area.extend(payload)
    return struct.pack(f"{order}HHII", tag, ttype, len(values), off)


def tiff_encode(
    img: "np.ndarray",
    transform: tuple[float, float, float, float] = (0.0, 0.0, 1.0, -1.0),
    epsg: int = 4326,
    compression: str = "none",
    tile: int | None = None,
    predictor: int = 1,
    big_endian: bool = False,
) -> bytes:
    """2-D array -> single-band (Geo)TIFF bytes.

    ``transform`` is (ox, oy, rx, ry) with ry < 0 (north-up): world
    coordinates of the TOP-LEFT corner plus pixel sizes, written as
    ModelTiepoint (0,0,0 -> ox,oy,0) + ModelPixelScale (rx, -ry, 0).
    ``tile``: None = one strip per 8 rows; else square tile edge (TIFF
    requires multiples of 16 for real readers; the decoder only requires
    consistency). ``predictor=2`` applies horizontal differencing
    (integer dtypes only, as in the TIFF spec)."""
    img = np.ascontiguousarray(img)
    if img.ndim != 2:
        raise ValueError("tiff_encode: single-band 2-D arrays only")
    order = ">" if big_endian else "<"
    sample_format, bits = _TIFF_FORMATS[img.dtype.str[1:]]
    if predictor == 2 and sample_format == 3:
        raise ValueError("predictor 2 is for integer samples")
    h, w = img.shape
    comp_code = {"none": 1, "deflate": 8}[compression]

    def _segment_bytes(seg: "np.ndarray") -> bytes:
        if predictor == 2:
            seg = seg.copy()
            seg[:, 1:] = seg[:, 1:] - seg[:, :-1]
        raw = seg.astype(img.dtype.newbyteorder(order)).tobytes()
        return zlib.compress(raw, 6) if comp_code == 8 else raw

    segments: list[bytes] = []
    if tile is None:
        rows_per_strip = 8
        for y0 in range(0, h, rows_per_strip):
            segments.append(_segment_bytes(img[y0 : y0 + rows_per_strip]))
    else:
        for ty in range(0, h, tile):
            for tx in range(0, w, tile):
                block = np.zeros((tile, tile), dtype=img.dtype)
                part = img[ty : ty + tile, tx : tx + tile]
                block[: part.shape[0], : part.shape[1]] = part
                segments.append(_segment_bytes(block))

    header_len = 8
    seg_offsets = []
    pos = header_len
    for s in segments:
        seg_offsets.append(pos)
        pos += len(s)
    ifd_offset = pos

    ox, oy, rx, ry = transform
    # GeoKeyDirectory: version 1.1.0, 1 key: GeographicTypeGeoKey(2048) or
    # ProjectedCSTypeGeoKey(3072) by EPSG range, value inline
    geo_key = 3072 if epsg >= 20000 else 2048
    geokeys = [1, 1, 0, 1, geo_key, 0, 1, epsg]

    tags: list[tuple[int, int, list]] = [
        (256, 4, [w]),
        (257, 4, [h]),
        (258, 3, [bits]),
        (259, 3, [comp_code]),
        (262, 3, [1]),
        (277, 3, [1]),
        (317, 3, [predictor]),
        (339, 3, [sample_format]),
        (33550, 12, [rx, -ry, 0.0]),
        (33922, 12, [0.0, 0.0, 0.0, ox, oy, 0.0]),
        (34735, 3, geokeys),
    ]
    if tile is None:
        tags += [(273, 4, seg_offsets), (278, 4, [8]), (279, 4, [len(s) for s in segments])]
    else:
        tags += [
            (322, 4, [tile]), (323, 4, [tile]),
            (324, 4, seg_offsets), (325, 4, [len(s) for s in segments]),
        ]
    tags.sort()

    ifd_len = 2 + 12 * len(tags) + 4
    data_base = ifd_offset + ifd_len
    data_area = bytearray()
    entries = b"".join(
        _tiff_entry(order, tag, ttype, vals, data_area, data_base)
        for tag, ttype, vals in tags
    )
    ifd = struct.pack(f"{order}H", len(tags)) + entries + struct.pack(f"{order}I", 0)
    magic = struct.pack(f"{order}2sHI", b"MM" if big_endian else b"II", 42, ifd_offset)
    return magic + b"".join(segments) + ifd + bytes(data_area)


def tiff_decode(
    data: bytes,
) -> tuple["np.ndarray", tuple[float, float, float, float], int | None]:
    """(Geo)TIFF bytes -> (pixels, (ox, oy, rx, ry), epsg or None).

    Real bitstream parse: endian-aware IFD walk, strip/tile reassembly,
    zlib inflate for DEFLATE segments, horizontal-predictor undo, GeoTIFF
    tag extraction. Raises ValueError on unsupported layouts (multi-band,
    palette, PackBits/LZW/JPEG-in-TIFF, float predictor)."""
    if len(data) < 8 or data[:2] not in (b"II", b"MM"):
        raise ValueError("not a TIFF: bad byte-order mark")
    order = "<" if data[:2] == b"II" else ">"
    magic, ifd_offset = struct.unpack_from(f"{order}HI", data, 2)
    if magic != 42:
        raise ValueError("not a TIFF: bad magic")

    (n_tags,) = struct.unpack_from(f"{order}H", data, ifd_offset)
    tags: dict[int, list] = {}
    for i in range(n_tags):
        base = ifd_offset + 2 + 12 * i
        tag, ttype, count = struct.unpack_from(f"{order}HHI", data, base)
        size = _TIFF_TYPE_SIZE.get(ttype)
        if size is None:
            continue
        nbytes = size * count
        off = base + 8 if nbytes <= 4 else struct.unpack_from(f"{order}I", data, base + 8)[0]
        fmt = {1: "B", 2: "c", 3: "H", 4: "I", 5: "I", 11: "f", 12: "d"}[ttype]
        n = count * (2 if ttype == 5 else 1)
        tags[tag] = list(struct.unpack_from(f"{order}{n}{fmt}", data, off))

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    bits, comp = one(258, 8), one(259, 1)
    spp, photo = one(277, 1), one(262, 1)
    predictor, sample_format = one(317, 1), one(339, 1)
    if spp != 1 or photo not in (0, 1):
        raise ValueError(f"unsupported TIFF: samples={spp} photometric={photo}")
    if comp not in (1, 8, 32946):
        raise ValueError(f"unsupported TIFF compression {comp}")
    dt = _TIFF_DTYPES.get((sample_format, bits))
    if dt is None:
        raise ValueError(f"unsupported TIFF sample: format={sample_format} bits={bits}")
    if predictor == 2 and sample_format == 3:
        raise ValueError("unsupported TIFF: floating-point predictor")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    dtype = np.dtype(order + dt)

    def _segment(off, cnt, seg_h, seg_w):
        raw = data[off : off + cnt]
        if len(raw) != cnt:
            raise ValueError("truncated TIFF segment")
        if comp in (8, 32946):
            raw = zlib.decompress(raw)
        arr = np.frombuffer(raw, dtype=dtype, count=seg_h * seg_w).reshape(seg_h, seg_w)
        if predictor == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=1).astype(dtype)
        return arr

    out = np.zeros((h, w), dtype=dtype.newbyteorder("="))
    if 322 in tags:  # tiled
        tw, th = one(322), one(323)
        offs, cnts = tags[324], tags[325]
        tiles_x = (w + tw - 1) // tw
        tiles_y = (h + th - 1) // th
        if len(offs) != tiles_x * tiles_y:
            raise ValueError("TIFF tile count mismatch")
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(i, tiles_x)
            block = _segment(off, cnt, th, tw)
            y0, x0 = ty * th, tx * tw
            out[y0 : y0 + th, x0 : x0 + tw] = block[
                : min(th, h - y0), : min(tw, w - x0)
            ]
    else:  # striped
        rows_per_strip = one(278, h)
        offs, cnts = tags[273], tags[279]
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            y0 = i * rows_per_strip
            seg_h = min(rows_per_strip, h - y0)
            out[y0 : y0 + seg_h] = _segment(off, cnt, seg_h, w)

    transform = (0.0, 0.0, 1.0, -1.0)
    if 33550 in tags and 33922 in tags:
        sx, sy = tags[33550][0], tags[33550][1]
        tp = tags[33922]
        # tiepoint maps raster (i, j) -> world (x, y); normalize to the
        # top-left-corner origin convention
        ox = tp[3] - tp[0] * sx
        oy = tp[4] + tp[1] * sy
        transform = (ox, oy, sx, -sy)

    epsg = None
    if 34735 in tags:
        gk = tags[34735]
        for k in range(4, len(gk) - 3, 4):
            if gk[k] in (2048, 3072) and gk[k + 1] == 0:
                epsg = int(gk[k + 3])
    return out, transform, epsg
