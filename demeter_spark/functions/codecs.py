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
