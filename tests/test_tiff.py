"""Stdlib GeoTIFF codec (functions/codecs.py): round-trip across the layout
matrix + loud failures on unsupported layouts. Closes SURVEY.md S1 — the
reference ingests real .tif bytes via rasterio (demeter/raster/__init__.py:
36-47); this decoder does the same parse from scratch."""

import numpy as np
import pytest

from demeter_spark.functions import codecs


def _img(dtype, w=37, h=21):
    xs = np.arange(w)[None, :]
    ys = np.arange(h)[:, None]
    v = (xs * 7 + ys * 13 + 5) % 251
    if np.dtype(dtype).kind == "f":
        return v.astype(dtype)
    if np.dtype(dtype) == np.int16:
        return (v - 125).astype(dtype)
    return v.astype(dtype)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int16", "int32", "float32", "float64"])
@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("big_endian", [False, True])
def test_roundtrip_matrix(dtype, compression, tile, big_endian):
    img = _img(dtype)
    tf = (12.5, -3.25, 0.25, -0.25)
    blob = codecs.tiff_encode(
        img, transform=tf, epsg=4269, compression=compression,
        tile=tile, big_endian=big_endian,
    )
    out, got_tf, epsg = codecs.tiff_decode(blob)
    assert out.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(out, img)
    assert got_tf == tf
    assert epsg == 4269


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32"])
@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("compression", ["deflate", "lzw"])
def test_roundtrip_predictor(dtype, tile, compression):
    img = _img(dtype)
    blob = codecs.tiff_encode(img, compression=compression, tile=tile, predictor=2)
    out, _, _ = codecs.tiff_decode(blob)
    np.testing.assert_array_equal(out, img)
    # predictor + deflate should beat plain deflate on smooth data
    plain = codecs.tiff_encode(img, compression="deflate", tile=tile)
    assert isinstance(plain, bytes)


def test_projected_epsg_key():
    blob = codecs.tiff_encode(_img("uint8"), epsg=32610)
    _, _, epsg = codecs.tiff_decode(blob)
    assert epsg == 32610


def test_unsupported_paths_fail_loudly():
    with pytest.raises(ValueError, match="byte-order"):
        codecs.tiff_decode(b"XXYY" + b"\0" * 16)
    with pytest.raises(ValueError, match="2-D"):
        codecs.tiff_encode(np.zeros((2, 2, 3, 1), dtype=np.uint8))
    with pytest.raises(ValueError, match="predictor 2"):
        codecs.tiff_encode(_img("float32"), predictor=2)
    # corrupt a segment: truncating the payload must not pass silently
    blob = codecs.tiff_encode(_img("uint8"), compression="deflate")
    import zlib as _z

    with pytest.raises((ValueError, _z.error)):
        codecs.tiff_decode(blob[:40] + b"\0" * 10 + blob[50:])


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw", "packbits"])
@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("predictor", [1, 2])
def test_multiband_roundtrip(compression, tile, predictor):
    """Multi-band interleaved (PlanarConfiguration=1, the GDAL default for
    satellite rasters): 4-band uint16, per-channel predictor."""
    base = _img("uint16", w=37, h=21)
    img = np.stack([base + b * 1000 for b in range(4)], axis=-1)
    blob = codecs.tiff_encode(
        img, compression=compression, tile=tile, predictor=predictor,
        epsg=32610,
    )
    out, _, epsg = codecs.tiff_decode(blob)
    assert out.shape == (21, 37, 4)
    np.testing.assert_array_equal(out, img)
    assert epsg == 32610


def test_rgb_photometric_roundtrip():
    img = np.stack([_img("uint8")] * 3, axis=-1)
    out, _, _ = codecs.tiff_decode(codecs.tiff_encode(img))
    np.testing.assert_array_equal(out, img)


def test_non_multiple_tile_crop():
    """21x37 image with 16px tiles: padded edge tiles must crop exactly."""
    img = _img("int32", w=37, h=21)
    out, _, _ = codecs.tiff_decode(codecs.tiff_encode(img, tile=16))
    assert out.shape == (21, 37)
    np.testing.assert_array_equal(out, img)


def test_tiff_cells_ingestion(spark):
    """GeoTIFF bytes -> cells-table model: the S1 ingestion path feeding
    every downstream raster operator. Spot-check pixel placement and the
    north-up -> south-up index flip for one deterministic doc."""
    from demeter_spark.sources import multimodal
    from tests.conftest import SF_DIR

    media = multimodal.tiff_media(spark, SF_DIR).filter("doc_id = 9")
    cells = multimodal.tiff_cells(media).collect()
    d = 9
    w, h = d % 37 + 4, d % 23 + 4
    assert len(cells) == w * h
    by_ix_iy = {(r["ix"], r["iy"]): r for r in cells}
    # raster row 0 (top) lands at south-up iy = h-1
    top_left = by_ix_iy[(0, h - 1)]
    assert top_left["value"] == float(d % 251)
    # world coords: top row center y = oy + ry/2 (ry < 0)
    ox, oy = (d % 100) * 0.5, (d % 16) * 0.25
    assert top_left["cx"] == ox + 0.125
    assert top_left["cy"] == oy - 0.125
    bottom_right = by_ix_iy[(w - 1, 0)]
    assert bottom_right["value"] == float(
        ((w - 1) * 7 + (h - 1) * 13 + d) % 251
    )
    assert bottom_right["cy"] == oy - h * 0.25 + 0.125


def test_tiff_query_matches_oracle(spark, ddb):
    import __spark_entry__ as entry
    from tests.conftest import SF_DIR

    key = lambda t: tuple((v is None, v) for v in t)
    got = sorted(
        map(tuple, entry.queries()["tiff_decode"](spark, SF_DIR).collect()),
        key=key,
    )
    want = sorted(ddb.sql(entry.oracle_sql()["tiff_decode"]).fetchall(), key=key)
    assert len(got) == len(want) == 500
    assert got == want


@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("compression", ["deflate", "lzw"])
def test_windowed_read_equals_crop(tile, compression):
    """COG-style windowed decode: equals the full-decode crop, with the
    transform origin shifted to the window corner."""
    img = _img("int32", w=37, h=21)
    tf = (10.0, 5.0, 0.5, -0.5)
    blob = codecs.tiff_encode(img, transform=tf, compression=compression, tile=tile)
    win = (9, 6, 30, 19)
    out, wtf, _ = codecs.tiff_decode(blob, window=win)
    np.testing.assert_array_equal(out, img[6:19, 9:30])
    assert wtf == (10.0 + 9 * 0.5, 5.0 - 6 * 0.5, 0.5, -0.5)


def test_windowed_read_never_touches_outside_segments():
    """Corrupt a tile OUTSIDE the window: windowed decode must still
    succeed (selective byte access, the point of COG), while a full decode
    of the same corrupted bytes fails."""
    img = _img("uint16", w=64, h=48)
    blob = bytearray(codecs.tiff_encode(img, compression="deflate", tile=16))
    # tiles are 4x3; corrupt the LAST tile's bytes (bottom-right corner)
    full, _, _ = codecs.tiff_decode(bytes(blob))
    np.testing.assert_array_equal(full, img)
    # find the last tile's offset from a fresh parse: encode layout places
    # segments in order right after the 8-byte header — corrupt the final
    # segment region by zeroing 64 bytes just before the IFD
    import struct as _s

    ifd_offset = _s.unpack_from("<I", bytes(blob), 4)[0]
    blob[ifd_offset - 64 : ifd_offset - 8] = b"\0" * 56
    with pytest.raises(Exception):
        codecs.tiff_decode(bytes(blob))
    # a window confined to the top-left tile decodes fine
    out, _, _ = codecs.tiff_decode(bytes(blob), window=(0, 0, 16, 16))
    np.testing.assert_array_equal(out, img[0:16, 0:16])


def test_window_bounds_validated():
    blob = codecs.tiff_encode(_img("uint8"))
    with pytest.raises(ValueError, match="window"):
        codecs.tiff_decode(blob, window=(0, 0, 1000, 10))


def test_tiff_cells_windowed_aligns_with_full(spark):
    """COG-style windowed ingestion: cells from a pixel window must be
    exactly the matching subset of the full ingest (same full-image (ix,
    iy) keys, same world coords, same values) — so windowed reads of a big
    raster compose with downstream operators identically."""
    from demeter_spark.sources import multimodal
    from tests.conftest import SF_DIR

    media = multimodal.tiff_media(spark, SF_DIR).filter("doc_id = 9")
    d = 9
    w, h = d % 37 + 4, d % 23 + 4  # 13 x 13
    win = (3, 2, 11, 9)
    full = {
        (r["ix"], r["iy"]): (r["value"], r["cx"], r["cy"])
        for r in multimodal.tiff_cells(media).collect()
    }
    got = {
        (r["ix"], r["iy"]): (r["value"], r["cx"], r["cy"])
        for r in multimodal.tiff_cells(media, window=win).collect()
    }
    assert len(got) == (win[2] - win[0]) * (win[3] - win[1])
    for k, v in got.items():
        assert full[k] == v, (k, v, full[k])


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("predictor", [1, 2])
def test_planar_multiband_roundtrip(compression, tile, predictor):
    """PlanarConfiguration=2 (band-separate): each band's strips/tiles are
    their own band-major segment run."""
    base = _img("int32", w=37, h=21)
    img = np.stack([base + b * 1000 for b in range(3)], axis=-1)
    blob = codecs.tiff_encode(
        img, compression=compression, tile=tile, predictor=predictor,
        planar=True,
    )
    out, _, _ = codecs.tiff_decode(blob)
    assert out.shape == (21, 37, 3)
    np.testing.assert_array_equal(out, img)


def test_planar_windowed_read():
    base = _img("uint16", w=64, h=48)
    img = np.stack([base, base + 7], axis=-1)
    blob = codecs.tiff_encode(img, compression="deflate", tile=16, planar=True)
    win = (10, 5, 40, 30)
    out, _, _ = codecs.tiff_decode(blob, window=win)
    np.testing.assert_array_equal(out, img[5:30, 10:40, :])


def test_planar_single_band_is_chunky():
    """planar=True on a single-band image degenerates to the ordinary
    layout (PlanarConfiguration stays 1)."""
    img = _img("uint8")
    blob = codecs.tiff_encode(img, planar=True)
    out, _, _ = codecs.tiff_decode(blob)
    np.testing.assert_array_equal(out, img)


@pytest.mark.parametrize("compression", ["none", "deflate", "lzw"])
@pytest.mark.parametrize("tile", [None, 16])
@pytest.mark.parametrize("big_endian", [False, True])
def test_bigtiff_roundtrip(compression, tile, big_endian):
    """BigTIFF (version 43, 8-byte offsets): classic TIFF's 32-bit offsets
    cap files at 4 GB — a real ceiling for continental rasters. Same pixel
    semantics, bigger container."""
    img = _img("int32")
    tf = (12.5, -3.25, 0.25, -0.25)
    blob = codecs.tiff_encode(
        img, transform=tf, epsg=5070, compression=compression, tile=tile,
        big_endian=big_endian, bigtiff=True,
    )
    assert blob[2:4] == (b"\x00\x2b" if big_endian else b"\x2b\x00")
    out, got_tf, epsg = codecs.tiff_decode(blob)
    np.testing.assert_array_equal(out, img)
    assert got_tf == tf
    assert epsg == 5070
    assert codecs.tiff_info(blob)["width"] == img.shape[1]


def test_bigtiff_multiband_windowed():
    base = _img("uint16", w=64, h=48)
    img = np.stack([base, base + 3, base + 9], axis=-1)
    blob = codecs.tiff_encode(img, tile=16, compression="deflate", bigtiff=True)
    out, _, _ = codecs.tiff_decode(blob, window=(5, 7, 50, 40))
    np.testing.assert_array_equal(out, img[7:40, 5:50, :])


def test_bigtiff_malformed_header():
    blob = bytearray(codecs.tiff_encode(_img("uint8"), bigtiff=True))
    blob[4] = 4  # offsetsize must be 8
    with pytest.raises(ValueError, match="BigTIFF"):
        codecs.tiff_decode(bytes(blob))


# ---------------------------------------------------------------------------
# New-style JPEG-in-TIFF (compression 7, JPEGTables tag 347) — VERDICT r04 #6


def test_tiff_jpeg_block_flat_roundtrip_exact():
    """8x8-block-flat uint8 images are bit-exact through JPEG-in-TIFF (flat
    blocks carry one integer DC through the all-ones quant table), striped
    and tiled, both byte orders — the property the tiff_decode oracle rows
    rely on."""
    rng = np.random.RandomState(5)
    for _ in range(6):
        w, h = rng.randint(3, 41), rng.randint(3, 27)
        d = rng.randint(0, 500)
        xs, ys = np.arange(w)[None, :], np.arange(h)[:, None]
        img = (((xs // 8) * 7 + (ys // 8) * 13 + d) % 251).astype(np.uint8)
        for tile in (None, 16):
            for be in (False, True):
                blob = codecs.tiff_encode(
                    img, compression="jpeg", tile=tile, big_endian=be
                )
                arr, _, _ = codecs.tiff_decode(blob)
                assert np.array_equal(arr, img), (w, h, tile, be)


def test_tiff_jpeg_tables_layout():
    """The shared tables ride tag 347 as an abbreviated SOI..EOI stream;
    per-segment streams are table-less (the TTN2 layout real writers emit),
    and every segment offset is word-aligned (ADVICE r04)."""
    blob = codecs.tiff_encode(
        np.full((20, 30), 77, np.uint8), compression="jpeg"
    )
    _, tags = codecs._tiff_tags(blob)
    jt = bytes(tags[347])
    assert jt[:2] == b"\xff\xd8" and jt[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in jt and b"\xff\xc4" in jt
    seg = blob[tags[273][0] : tags[273][0] + tags[279][0]]
    assert b"\xff\xdb" not in seg and b"\xff\xc4" not in seg
    assert all(o % 2 == 0 for o in tags[273])


def test_tiff_jpeg_general_image_near_lossless():
    """Arbitrary uint8 content decodes to the independent
    DCT-round-IDCT reconstruction (all-ones quant => max error 1)."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(19, 22), dtype=np.uint8)
    arr, _, _ = codecs.tiff_decode(
        codecs.tiff_encode(img, compression="jpeg")
    )
    A = codecs._IDCT_A
    want = np.zeros_like(img)
    for y0 in range(0, 19, 8):
        seg = img[y0 : y0 + 8].astype(np.float64)
        sh, sw = seg.shape
        by, bx = (sh + 7) // 8, (sw + 7) // 8
        pad = np.pad(
            seg - 128.0, ((0, by * 8 - sh), (0, bx * 8 - sw)), mode="edge"
        )
        bl = pad.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        co = np.round(np.matmul(A, np.matmul(bl, A.T)))
        pix = np.matmul(A.T, np.matmul(co, A))
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        want[y0 : y0 + sh] = np.clip(np.round(plane[:sh, :sw]) + 128, 0, 255)
    assert np.array_equal(arr, want)
    assert np.abs(arr.astype(int) - img.astype(int)).max() <= 1


def test_tiff_jpeg_windowed_read_skips_outside_tiles():
    """COG windowed reads hold for JPEG tiles too: an out-of-window tile is
    never entropy-decoded (proved by corrupting it)."""
    img = (
        ((np.arange(48)[None, :] // 8) * 7 + (np.arange(32)[:, None] // 8) * 13)
        % 251
    ).astype(np.uint8)
    blob = bytearray(codecs.tiff_encode(img, compression="jpeg", tile=16))
    _, tags = codecs._tiff_tags(bytes(blob))
    off, cnt = tags[324][-1], tags[325][-1]
    blob[off : off + cnt] = b"\xde" * cnt
    arr, _, _ = codecs.tiff_decode(bytes(blob), window=(0, 0, 16, 16))
    assert np.array_equal(arr, img[:16, :16])


def test_tiff_jpeg_rejects_unsupported_shapes():
    img16 = np.zeros((8, 8), np.uint16)
    with pytest.raises(ValueError, match="uint8"):
        codecs.tiff_encode(img16, compression="jpeg")
    with pytest.raises(ValueError, match="predictor"):
        codecs.tiff_encode(
            np.zeros((8, 8), np.uint8), compression="jpeg", predictor=2
        )


def test_tiff_golden_bytes_hand_authored():
    """Interop pin (ADVICE r04): a fixture laid out BY HAND to the TIFF 6.0
    spec — not produced by tiff_encode — with conventions our writer never
    emits: one full-height strip (no RowsPerStrip tag -> default = image
    height), inline offset/count values, minimal tag set, different tag
    ordering, IFD before pixel data. A decoder secretly coupled to the
    in-repo writer's layout fails here."""
    import struct

    # 3x2 uint8 grayscale, pixels row-major: 10 20 30 / 40 50 60
    pixels = bytes([10, 20, 30, 40, 50, 60])
    # layout: header(8) + IFD + pixel data AFTER the IFD
    # IFD: 6 entries x 12 + count(2) + next(4) = 78; data at 8+78 = 86
    entries = [
        (256, 3, 1, 3),    # ImageWidth SHORT 3
        (257, 3, 1, 2),    # ImageLength SHORT 2
        (258, 3, 1, 8),    # BitsPerSample 8
        (259, 3, 1, 1),    # Compression none
        (273, 4, 1, 86),   # StripOffsets -> after IFD
        (279, 4, 1, 6),    # StripByteCounts
    ]
    ifd = struct.pack("<H", len(entries))
    for tag, ttype, count, value in entries:
        ifd += struct.pack("<HHI", tag, ttype, count)
        ifd += struct.pack("<I", value) if ttype == 4 else struct.pack(
            "<HH", value, 0
        )
    ifd += struct.pack("<I", 0)
    blob = b"II" + struct.pack("<HI", 42, 8) + ifd + pixels
    assert len(blob) == 86 + 6

    arr, transform, epsg = codecs.tiff_decode(blob)
    assert arr.shape == (2, 3) and arr.dtype == np.uint8
    assert arr.tolist() == [[10, 20, 30], [40, 50, 60]]
    assert transform == (0.0, 0.0, 1.0, -1.0) and epsg is None
    info = codecs.tiff_info(blob)
    assert info["width"] == 3 and info["height"] == 2 and not info["tiled"]

    # big-endian variant of the same hand layout
    ifd_be = struct.pack(">H", len(entries))
    for tag, ttype, count, value in entries:
        ifd_be += struct.pack(">HHI", tag, ttype, count)
        ifd_be += struct.pack(">I", value) if ttype == 4 else struct.pack(
            ">HH", value, 0
        )
    ifd_be += struct.pack(">I", 0)
    blob_be = b"MM" + struct.pack(">HI", 42, 8) + ifd_be + pixels
    arr_be, _, _ = codecs.tiff_decode(blob_be)
    assert arr_be.tolist() == [[10, 20, 30], [40, 50, 60]]


def test_tiff_jpeg_color_photometric_ycbcr():
    """Color JPEG-in-TIFF (photometric 6, the standard real-world pairing):
    a hand-assembled container whose single strip is a full YCbCr 4:4:4
    JPEG stream (no JPEGTables tag — standalone segments are equally legal)
    must decode to exactly what the JPEG decoder yields for that stream."""
    import struct

    q = np.ones((8, 8), dtype=np.int64)
    q[0, 0] = 16
    cq = np.full((8, 8), 2, dtype=np.int64)

    def coef(dc):
        c = np.zeros((2, 3, 8, 8), dtype=np.int64)
        c[:, :, 0, 0] = dc
        c[0, 1, 2, 2] = 7
        return c

    jpeg = codecs.jpeg_encode_blocks(
        coef(12), q, 24, 16, chroma=(coef(-5), coef(9), cq))
    want = codecs.jpeg_decode(jpeg)
    assert want.shape == (16, 24, 3)

    entries = [
        (256, 3, 1, 24),          # width
        (257, 3, 1, 16),          # height
        (258, 3, 1, 8),           # bits per sample (count 1: readers accept)
        (259, 3, 1, 7),           # compression: new-style JPEG
        (262, 3, 1, 6),           # photometric: YCbCr
        (277, 3, 1, 3),           # samples per pixel
        (278, 3, 1, 16),          # rows per strip
    ]
    # IFD first, strip after; compute layout
    n = len(entries) + 2  # + strip offsets/counts
    ifd_len = 2 + 12 * n + 4
    strip_off = 8 + ifd_len
    entries += [(273, 4, 1, strip_off), (279, 4, 1, len(jpeg))]
    entries.sort()
    ifd = struct.pack("<H", n)
    for tag, ttype, count, value in entries:
        ifd += struct.pack("<HHI", tag, ttype, count)
        ifd += struct.pack("<I", value) if ttype == 4 else struct.pack(
            "<HH", value, 0
        )
    ifd += struct.pack("<I", 0)
    blob = b"II" + struct.pack("<HI", 42, 8) + ifd + jpeg

    arr, _, _ = codecs.tiff_decode(blob)
    assert arr.shape == (16, 24, 3)
    assert np.array_equal(arr, want)


# ---------------------------------------------------------------------------
# Floating-point predictor (3) — TIFF TechNote 3, the GDAL float-DEM layout


def test_tiff_float_predictor_roundtrip():
    """Predictor 3 (byte-plane split + byte differencing) round-trips
    float32/float64, 1- and 3-band, striped and tiled, both container
    endians, through every compression."""
    rng = np.random.RandomState(3)
    for _ in range(4):
        w, h = rng.randint(3, 41), rng.randint(3, 27)
        spp = rng.choice([1, 3])
        dt = rng.choice(["float32", "float64"])
        img = (rng.rand(h, w, spp) * 1000 - 500).astype(dt)
        if spp == 1:
            img = img[:, :, 0]
        for compq in ("deflate", "lzw", "none"):
            for tile in (None, 16):
                blob = codecs.tiff_encode(
                    img, compression=compq, tile=tile, predictor=3,
                    big_endian=bool(rng.randint(2)),
                )
                arr, _, _ = codecs.tiff_decode(blob)
                assert np.array_equal(arr, img), (w, h, spp, dt, compq, tile)


def test_tiff_float_predictor_compresses_smooth_fields():
    """The predictor's purpose: a smooth DEM-like float field DEFLATEs
    substantially smaller with byte-plane differencing than without."""
    ys, xs = np.mgrid[0:64, 0:64]
    dem = (np.sin(xs / 9.0) * 40 + ys * 0.7 + 100).astype("float32")
    p1 = len(codecs.tiff_encode(dem, compression="deflate", predictor=1))
    p3 = len(codecs.tiff_encode(dem, compression="deflate", predictor=3))
    assert p3 < 0.8 * p1, (p1, p3)


def test_tiff_predictor_guards():
    with pytest.raises(ValueError, match="float"):
        codecs.tiff_encode(np.zeros((4, 4), np.uint8), predictor=3)
    with pytest.raises(ValueError, match="integer"):
        codecs.tiff_encode(np.zeros((4, 4), np.float32), predictor=2)
    # decode-side: predictor 3 declared on integer samples fails loudly
    blob = bytearray(codecs.tiff_encode(np.zeros((4, 4), np.uint8)))
    _, tags = codecs._tiff_tags(bytes(blob))
    idx = bytes(blob).find(b"\x3d\x01")  # tag 317 little-endian in IFD
    assert idx > 0
    blob[idx + 8] = 3  # inline SHORT value
    with pytest.raises(ValueError, match="integer"):
        codecs.tiff_decode(bytes(blob))


# ---------------------------------------------------------------------------
# COG overview pyramid (chained reduced-resolution IFDs)


def test_tiff_overview_pyramid_roundtrip():
    """overviews=[2, 4] appends chained IFDs (NewSubfileType=1) holding
    factor-decimated copies with correspondingly coarser pixel scale;
    tiff_info lists them header-only and tiff_decode(level=N) reads each —
    across endians, classic/BigTIFF, compressions and strip/tile layouts."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 251, size=(50, 70)).astype("uint16")
    for be in (False, True):
        for bigt in (False, True):
            blob = codecs.tiff_encode(
                img, transform=(10.0, 5.0, 0.5, -0.5), compression="deflate",
                tile=16, big_endian=be, bigtiff=bigt, overviews=[2, 4],
            )
            info = codecs.tiff_info(blob)
            assert info["overviews"] == [(35, 25), (18, 13)]
            a0, t0, _ = codecs.tiff_decode(blob)
            a1, t1, _ = codecs.tiff_decode(blob, level=1)
            a2, t2, _ = codecs.tiff_decode(blob, level=2)
            assert np.array_equal(a0, img)
            assert np.array_equal(a1, img[::2, ::2])
            assert np.array_equal(a2, img[::4, ::4])
            assert t1 == (10.0, 5.0, 1.0, -1.0)
            assert t2 == (10.0, 5.0, 2.0, -2.0)


def test_tiff_overview_windowed_read_touches_level_bytes_only():
    """A windowed read at an overview level never touches full-resolution
    segments (corrupting ALL of level 0's tiles leaves it intact) — the
    zoomed-out COG access pattern."""
    img = (
        ((np.arange(96)[None, :] * 7 + np.arange(64)[:, None] * 13) % 251)
    ).astype("uint8")
    blob = bytearray(codecs.tiff_encode(img, tile=16, overviews=[2]))
    _, ifds = codecs._tiff_ifds(bytes(blob))
    for off, cnt in zip(ifds[0][324], ifds[0][325]):
        blob[off : off + cnt] = b"\xee" * cnt  # wreck every level-0 tile
    arr, _, _ = codecs.tiff_decode(bytes(blob), window=(0, 0, 16, 16), level=1)
    assert np.array_equal(arr, img[::2, ::2][:16, :16])
    with pytest.raises(ValueError):
        codecs.tiff_decode(bytes(blob), level=5)


def test_tiff_legacy_single_ifd_unchanged():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    blob = codecs.tiff_encode(img)
    assert codecs.tiff_info(blob)["overviews"] == []
    arr, _, _ = codecs.tiff_decode(blob)
    assert np.array_equal(arr, img)


def test_tiff_gdal_nodata_tag():
    """GDAL_NODATA (tag 42113, ASCII decimal): written by the encoder,
    surfaced by tiff_info, and honored by the tiff_cells ingestion as NULL
    values — the reference's masked-array convention."""
    img = np.array([[1, 2, 255], [255, 5, 6]], dtype=np.uint8)
    blob = codecs.tiff_encode(img, nodata=255)
    assert codecs.tiff_info(blob)["nodata"] == 255.0
    # decode itself is raw (signature stable)
    arr, _, _ = codecs.tiff_decode(blob)
    assert np.array_equal(arr, img)
    # float nodata formats too
    fblob = codecs.tiff_encode(
        np.zeros((3, 3), np.float32), nodata=-9999.0, predictor=3,
        compression="deflate",
    )
    assert codecs.tiff_info(fblob)["nodata"] == -9999.0
    assert codecs.tiff_info(codecs.tiff_encode(img))["nodata"] is None


def test_tiff_cells_null_out_nodata(spark):
    """tiff_cells emits NULL for nodata pixels so downstream NULL-skipping
    aggregates (zonal stats, merges) treat them as masked."""
    from demeter_spark.sources import multimodal

    img = np.array([[10, 255], [255, 40]], dtype=np.uint8)
    blob = codecs.tiff_encode(img, nodata=255)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "doc_id BIGINT, payload BINARY"
    )
    rows = {(r["ix"], r["iy"]): r["value"]
            for r in multimodal.tiff_cells(df).collect()}
    assert len(rows) == 4
    # south-up: iy 1 = top row of the image
    assert rows[(0, 1)] == 10.0 and rows[(1, 0)] == 40.0
    assert rows[(1, 1)] is None and rows[(0, 0)] is None
