"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The 100 TB training-data posture: media payloads are opaque ``binary``
columns; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` kernels so bytes never round-trip through Python row
objects. The codec step is REAL for PNG, PCM WAV, baseline grayscale JPEG
and GeoTIFF (stdlib decoders, functions/codecs.py — ``decode_real`` /
``decode_tiff`` + ``real_media`` / ``tiff_media``, oracle-verified against
closed-form pixel/sample math); only H.264-class video codecs remain the
documented NotImplementedError. The original
fake-format plumbing below stays as the wide-shape fixture (headers with
width/height/duration for resize planning and frame fan-out):

    payload = b"IMG|<width>|<height>|" + b"x" * n_fill

``media()`` synthesizes the table from documents closed-form, so the DuckDB
oracle regenerates identical bytes and the decode kernel's output is exactly
checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demeter_spark.sources.synth import documents


def media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: (doc_id, kind, payload binary, meta map)."""
    return documents(spark, sf_dir).selectExpr(
        "doc_id",
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "CAST(doc_id % 64 + 1 AS INT) AS _w",
        "CAST(doc_id % 48 + 1 AS INT) AS _h",
    ).selectExpr(
        "doc_id",
        "kind",
        "encode(concat('IMG|', CAST(_w AS STRING), '|', CAST(_h AS STRING), '|', "
        "repeat('x', CAST(doc_id % 32 + 4 AS INT))), 'UTF-8') AS payload",
        "map('codec', 'fake', 'kind', kind) AS meta",
    )


def decode_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched binary decode -> typed features (the real plumbing).

    Parses the fake header per batch; a real deployment swaps the parser for
    an image/audio codec with the identical signature and schema.
    """

    def _decode(batches):
        for pdf in batches:
            # vectorized: bytes -> pandas string dtype once, then .str ops
            # (no per-row Python lambdas inside the Arrow batch)
            text = pdf["payload"].astype("bytes").str.decode("utf-8")
            parts = text.str.split("|", expand=True)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": parts[1].astype("int32"),
                    "height": parts[2].astype("int32"),
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                }
            )
            out["aspect"] = out["width"].astype("float64") / out["height"]
            yield out

    return media_df.select("doc_id", "kind", "payload").mapInPandas(
        _decode,
        "doc_id BIGINT, kind STRING, width INT, height INT, n_bytes BIGINT, aspect DOUBLE",
    )


def real_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media table with REAL bitstreams, cycling by doc_id % 3:
    0 -> an actual PNG (8-bit gray gradient, pixel (x, y) =
    (x*7 + y*13 + doc_id) % 256, size (doc_id%16+4) x (doc_id%12+4));
    1 -> an actual RIFF PCM16 WAV (8 kHz square wave, amplitude
    3000 + doc_id%1000, 800 + doc_id%100 samples); 2 -> an actual grayscale
    JPEG built from DC-only quantized coefficient blocks (q00 = 16,
    DC(i, j) = (i*5 + j*11 + doc_id) % 128 - 64, so each 8x8 block decodes
    to the flat value 2*DC + 128 — analytically exact through the full
    Huffman + IDCT path), alternating BASELINE (doc_id % 6 == 2) and
    PROGRESSIVE SOF2 (doc_id % 6 == 5, five-scan spectral-selection +
    successive-approximation script — VERDICT r04 #3: web-crawl imagery is
    heavily progressive) layouts; both decode to the same closed form, so
    the oracle is unchanged. Payloads are deterministic, so decoded
    features admit a closed-form DuckDB oracle — the encode+decode round
    trip is verified against an INDEPENDENT derivation, not against
    itself."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _gen(batches):
        for pdf in batches:
            payloads = []
            kinds = []
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 3 == 0:
                    w, h = d % 16 + 4, d % 12 + 4
                    xs = np.arange(w)[None, :]
                    ys = np.arange(h)[:, None]
                    img = ((xs * 7 + ys * 13 + d) % 256).astype(np.uint8)
                    payloads.append(codecs.png_encode(img))
                    kinds.append("image")
                elif d % 3 == 1:
                    n = 800 + d % 100
                    amp = 3000 + d % 1000
                    sq = np.where((np.arange(n) // 8) % 2 == 0, amp, -amp)
                    payloads.append(codecs.wav_encode(sq.astype(np.int16), 8000))
                    kinds.append("audio")
                else:
                    bx, by = d % 4 + 1, d % 3 + 1
                    q = np.ones((8, 8), dtype=np.int64)
                    q[0, 0] = 16
                    co = np.zeros((by, bx, 8, 8), dtype=np.int64)
                    for j in range(by):
                        for i in range(bx):
                            co[j, i, 0, 0] = (i * 5 + j * 11 + d) % 128 - 64
                    enc = (
                        codecs.jpeg_encode_progressive
                        if d % 6 == 5
                        else codecs.jpeg_encode_blocks
                    )
                    payloads.append(enc(co, q, bx * 8, by * 8))
                    kinds.append("image")
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "kind": kinds, "payload": payloads}
            )

    return documents(spark, sf_dir).select("doc_id").mapInPandas(
        _gen, "doc_id BIGINT, kind STRING, payload BINARY"
    )


def decode_real(media_df: DataFrame) -> DataFrame:
    """REAL-codec decode: sniffs the payload magic and runs the stdlib-based
    PNG / WAV / baseline-JPEG decoders (functions/codecs.py) inside the
    Arrow batch — an actual bitstream parse (zlib inflate, scanline
    unfiltering, RIFF chunk walk, Huffman entropy decode + IDCT), not a
    header fake. Formats needing external libraries (H.264-class video)
    raise NotImplementedError per payload — the one remaining sandbox
    stub."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _decode(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "kind": [], "width": [], "height": [],
                "channels": [], "n_samples": [], "sample_rate": [],
                "mean_value": [],
            }
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                if blob[:8] == b"\x89PNG\r\n\x1a\n":
                    img = codecs.png_decode(blob)
                    h, w, ch = img.shape
                    rows["kind"].append("image")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(ch)
                    rows["n_samples"].append(None)
                    rows["sample_rate"].append(None)
                    rows["mean_value"].append(
                        float(img.sum(dtype=np.int64)) / img.size
                    )
                elif blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
                    rate, ch, samples = codecs.wav_decode(blob)
                    rows["kind"].append("audio")
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["channels"].append(ch)
                    rows["n_samples"].append(len(samples))
                    rows["sample_rate"].append(rate)
                    rows["mean_value"].append(
                        float(np.abs(samples.astype(np.int64)).sum())
                        / len(samples)
                    )
                elif blob[:2] == b"\xff\xd8":
                    img = codecs.jpeg_decode(blob)
                    h, w = img.shape
                    rows["kind"].append("image")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(1)
                    rows["n_samples"].append(None)
                    rows["sample_rate"].append(None)
                    rows["mean_value"].append(
                        float(img.sum(dtype=np.int64)) / img.size
                    )
                elif blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                    frames, w, h, usec = codecs.avi_mjpeg_decode(blob)
                    rows["kind"].append("video")
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(1)
                    rows["n_samples"].append(len(frames))
                    rows["sample_rate"].append(1_000_000 // usec)
                    rows["mean_value"].append(
                        float(
                            sum(int(fr.sum(dtype=np.int64)) for fr in frames)
                        )
                        / sum(fr.size for fr in frames)
                    )
                else:
                    raise NotImplementedError(
                        "real decode supports PNG, PCM WAV, JPEG (baseline "
                        "+ progressive) and MJPEG-in-AVI in this "
                        "environment; H.264-class inter-coded codecs need "
                        "external libraries"
                    )
                rows["doc_id"].append(d)
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "payload").mapInPandas(
        _decode,
        "doc_id BIGINT, kind STRING, width INT, height INT, channels INT, "
        "n_samples BIGINT, sample_rate INT, mean_value DOUBLE",
    )


REAL_MEDIA_ORACLE_SQL = """
    SELECT d.doc_id, 'image' AS kind,
           CAST(d.doc_id % 16 + 4 AS INT) AS width,
           CAST(d.doc_id % 12 + 4 AS INT) AS height,
           CAST(1 AS INT) AS channels,
           CAST(NULL AS BIGINT) AS n_samples,
           CAST(NULL AS INT) AS sample_rate,
           (SELECT CAST(sum((x.x * 7 + y.y * 13 + d.doc_id) % 256) AS DOUBLE)
            FROM range(20) x(x), range(16) y(y)
            WHERE x.x < d.doc_id % 16 + 4 AND y.y < d.doc_id % 12 + 4)
             / ((d.doc_id % 16 + 4) * (d.doc_id % 12 + 4)) AS mean_value
    FROM documents d WHERE d.doc_id % 3 = 0
    UNION ALL
    SELECT d.doc_id, 'audio',
           CAST(NULL AS INT), CAST(NULL AS INT), CAST(1 AS INT),
           CAST(800 + d.doc_id % 100 AS BIGINT),
           CAST(8000 AS INT),
           CAST(3000 + d.doc_id % 1000 AS DOUBLE)
    FROM documents d WHERE d.doc_id % 3 = 1
    UNION ALL
    -- baseline JPEG: DC-only blocks with q00 = 16 decode to the flat value
    -- 2*DC + 128 = 2*((i*5 + j*11 + doc_id) % 128); equal-size blocks, so
    -- the pixel mean is the block-value mean
    SELECT d.doc_id, 'image',
           CAST((d.doc_id % 4 + 1) * 8 AS INT),
           CAST((d.doc_id % 3 + 1) * 8 AS INT),
           CAST(1 AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS INT),
           (SELECT CAST(sum(2 * ((i.i * 5 + j.j * 11 + d.doc_id) % 128)) AS DOUBLE)
            FROM range(4) i(i), range(3) j(j)
            WHERE i.i < d.doc_id % 4 + 1 AND j.j < d.doc_id % 3 + 1)
             / ((d.doc_id % 4 + 1) * (d.doc_id % 3 + 1)) AS mean_value
    FROM documents d WHERE d.doc_id % 3 = 2
"""


MEDIA_ORACLE_SQL = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(doc_id % 64 + 1 AS INT) AS width,
           CAST(doc_id % 48 + 1 AS INT) AS height,
           CAST(length('IMG||' || CAST(doc_id % 64 + 1 AS VARCHAR)
                 || CAST(doc_id % 48 + 1 AS VARCHAR) || '|')
                + doc_id % 32 + 4 AS BIGINT) AS n_bytes,
           CAST(doc_id % 64 + 1 AS DOUBLE) / CAST(doc_id % 48 + 1 AS INT) AS aspect
    FROM documents
"""


def resize_meta(media_df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning (multimodal mandate): target dimensions preserving
    aspect ratio, capped at ``max_side`` — the metadata half of a resize
    (the pixel kernel itself is the stubbed codec). Catalyst-only after the
    Arrow decode."""
    feats = decode_features(media_df)
    scale = F.when(
        F.greatest(F.col("width"), F.col("height")) > max_side,
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    ).otherwise(F.lit(1.0))
    return feats.select(
        "doc_id",
        "kind",
        "width",
        "height",
        F.floor(F.col("width").cast("double") * scale).cast("int").alias("new_w"),
        F.floor(F.col("height").cast("double") * scale).cast("int").alias("new_h"),
    )


def video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic video table: (doc_id, payload binary) where each payload is
    a REAL MJPEG-in-AVI bitstream (VERDICT r05 #3 — RIFF container walk +
    the stdlib JPEG codec per frame; functions/codecs.py avi_mjpeg_encode).
    Per doc: n_frames = d%5+2 grayscale frames of (d%3+1)x(d%2+1) 8x8
    blocks at fps in {4, 5, 8}; frame f's block (i, j) is DC-only with
    DC = (i*5 + j*11 + f*17 + d) % 128 - 64, so every decoded pixel is the
    closed form 2*DC + 128 — bit-exact through the Huffman+IDCT path and
    oracle-checkable in DuckDB."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _gen(batches):
        q = np.ones((8, 8), dtype=np.int64)
        q[0, 0] = 16
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                n_frames = d % 5 + 2
                bx, by = d % 3 + 1, d % 2 + 1
                usec = [250_000, 200_000, 125_000][d % 3]
                frames = []
                for f in range(n_frames):
                    co = np.zeros((by, bx, 8, 8), dtype=np.int64)
                    for j in range(by):
                        for i in range(bx):
                            co[j, i, 0, 0] = (
                                i * 5 + j * 11 + f * 17 + d
                            ) % 128 - 64
                    frames.append(
                        codecs.jpeg_encode_blocks(co, q, bx * 8, by * 8)
                    )
                payloads.append(
                    codecs.avi_mjpeg_encode(frames, bx * 8, by * 8, usec)
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents(spark, sf_dir).select("doc_id").mapInPandas(
        _gen, "doc_id BIGINT, payload BINARY"
    )


def sample_video_frames(media_df: DataFrame, stride: int = 2) -> DataFrame:
    """REAL frame sampling (VERDICT r05 #3): decode the MJPEG-in-AVI
    container inside the Arrow batch and emit one row per SAMPLED frame
    (every ``stride``-th), with the frame clock from the avih header and
    per-frame pixel statistics from the actual JPEG decode — the
    mapInPandas shape a real deployment keeps, with only the entropy
    decoder swapped for a hardware-accelerated one. Partitioning follows
    the input's (doc-keyed) layout; the fan-out happens executor-side, so
    no frame bytes ever cross a shuffle."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _sample(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "n_frames": [], "fps": [], "frame_idx": [],
                "t_ms": [], "width": [], "height": [], "mean_value": [],
            }
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                frames, w, h, usec = codecs.avi_mjpeg_decode(bytes(blob))
                fps = 1_000_000 // usec
                for f in range(0, len(frames), stride):
                    rows["doc_id"].append(d)
                    rows["n_frames"].append(len(frames))
                    rows["fps"].append(fps)
                    rows["frame_idx"].append(f)
                    rows["t_ms"].append(f * usec // 1000)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_value"].append(
                        float(frames[f].sum(dtype=np.int64))
                        / frames[f].size
                    )
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "payload").mapInPandas(
        _sample,
        "doc_id BIGINT, n_frames INT, fps INT, frame_idx INT, t_ms INT, "
        "width INT, height INT, mean_value DOUBLE",
    )


# ---------------------------------------------------------------------------
# GeoTIFF ingestion (S1 — the reference's Raster.from_file front door,
# demeter/raster/__init__.py:36-47, rebuilt on the stdlib codec in
# functions/codecs.py)


def tiff_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic GeoTIFF table: (doc_id, payload binary) where each payload
    is a REAL .tif bitstream covering the layout matrix deterministically —
    striped/tiled x none/DEFLATE/LZW/PackBits x predictor 1/2 x four dtypes
    x both byte orders, with GeoTIFF georeferencing tags. pixel(x, y) =
    (x*7 + y*13 + doc_id) % 251, so decoded features admit a closed-form
    DuckDB oracle (encode and decode cannot share a compensating bug).

    doc_id % 8 == 6 rows are NEW-STYLE JPEG-IN-TIFF (compression 7 with the
    shared JPEGTables tag 347 — VERDICT r04 #6): uint8 with the 8x8
    BLOCK-FLAT field pixel(x, y) = ((x//8)*7 + (y//8)*13 + doc_id) % 251,
    which is bit-exact through the DCT (flat blocks carry a single integer
    DC), keeping the oracle closed-form through a lossy-family codec."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _gen(batches):
        for pdf in batches:
            payloads = []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = d % 37 + 4, d % 23 + 4
                xs = np.arange(w)[None, :]
                ys = np.arange(h)[:, None]
                jpeg = d % 8 == 6
                if jpeg:
                    img = (
                        ((xs // 8) * 7 + (ys // 8) * 13 + d) % 251
                    ).astype("uint8")
                else:
                    img = ((xs * 7 + ys * 13 + d) % 251).astype(
                        ["uint8", "uint16", "int32", "float32"][d % 4]
                    )
                payloads.append(
                    codecs.tiff_encode(
                        img,
                        transform=(
                            (d % 100) * 0.5, (d % 16) * 0.25, 0.25, -0.25,
                        ),
                        epsg=[4326, 4269, 32610][d % 3],
                        compression="jpeg" if jpeg else
                        ["deflate", "none", "lzw", "packbits"][(d // 4) % 4],
                        tile=16 if d % 3 == 0 else None,
                        # d%5==0 rows carry a predictor: byte-plane float
                        # predictor 3 for float32 rows (TechNote 3, the
                        # GDAL DEM layout), horizontal differencing 2
                        # otherwise — both lossless, oracle unchanged
                        predictor=(
                            1 if (jpeg or d % 5 != 0)
                            else (3 if d % 4 == 3 else 2)
                        ),
                        big_endian=d % 7 == 0,
                        # d%6==4 rows carry a COG overview pyramid (one
                        # factor-2 level) — the decode features report
                        # n_overviews, oracle-checked per round. JPEG rows
                        # are EXCLUDED (ADVICE r05): factor-2 decimation of
                        # the 8x8-block-flat field is not block-flat, so its
                        # overview would be lossy through the DCT and any
                        # future pixel-content oracle over overview levels
                        # would silently fail on exactly those rows
                        overviews=[2] if (d % 6 == 4 and not jpeg) else None,
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return documents(spark, sf_dir).select("doc_id").mapInPandas(
        _gen, "doc_id BIGINT, payload BINARY"
    )


def decode_tiff(media_df: DataFrame) -> DataFrame:
    """REAL GeoTIFF decode inside the Arrow batch: endian-aware IFD walk,
    strip/tile reassembly, zlib inflate, predictor undo, geo-tag extraction
    — emits per-raster features + the affine transform + EPSG."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _decode(batches):
        for pdf in batches:
            rows = {
                "doc_id": [], "width": [], "height": [], "dtype": [],
                "ox": [], "oy": [], "rx": [], "ry": [], "epsg": [],
                "px_sum": [], "px_first": [], "px_last": [],
                "n_overviews": [],
            }
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                arr, (ox, oy, rx, ry), epsg = codecs.tiff_decode(bytes(blob))
                rows["n_overviews"].append(
                    len(codecs.tiff_info(bytes(blob))["overviews"])
                )
                rows["doc_id"].append(d)
                rows["height"].append(arr.shape[0])
                rows["width"].append(arr.shape[1])
                rows["dtype"].append(str(arr.dtype))
                rows["ox"].append(ox)
                rows["oy"].append(oy)
                rows["rx"].append(rx)
                rows["ry"].append(ry)
                rows["epsg"].append(epsg)
                rows["px_sum"].append(float(arr.astype(np.float64).sum()))
                rows["px_first"].append(float(arr[0, 0]))
                rows["px_last"].append(float(arr[-1, -1]))
            yield pd.DataFrame(rows)

    return media_df.select("doc_id", "payload").mapInPandas(
        _decode,
        "doc_id BIGINT, width INT, height INT, dtype STRING, ox DOUBLE, "
        "oy DOUBLE, rx DOUBLE, ry DOUBLE, epsg INT, px_sum DOUBLE, "
        "px_first DOUBLE, px_last DOUBLE, n_overviews INT",
    )


def tiff_cells(
    media_df: DataFrame,
    window: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """GeoTIFF bytes -> the engine's cells-table raster model
    (doc_id, ix, iy, value, world cx/cy): the actual S1 ingestion path —
    every downstream raster operator (zonal, merge, reproject) consumes this
    shape. North-up ry < 0 is normalized into the south-up cell convention
    (iy counts up from the BOTTOM edge) so rasterize/zonal guards hold.

    ``window`` = (x0, y0, x1, y1) full-image pixel bounds: the COG access
    pattern — only intersecting strips/tiles are decompressed per payload
    (codecs.tiff_decode window support), and emitted (ix, iy) stay in
    FULL-image coordinates so windowed ingests of the same raster align."""
    import numpy as np

    from demeter_spark.functions import codecs

    def _cells(batches):
        for pdf in batches:
            out = []
            for d, blob in zip(pdf["doc_id"], pdf["payload"]):
                blob = bytes(blob)
                arr, (ox, oy, rx, ry), _ = codecs.tiff_decode(
                    blob, window=window
                )
                h, w = arr.shape
                iy, ix = np.mgrid[0:h, 0:w]
                if window is not None:
                    # keep FULL-image pixel indices (windowed ingests of the
                    # same raster must align); the south-up flip needs the
                    # full-image height, read from the IFD alone
                    full_h = codecs.tiff_info(blob)["height"]
                    ix = ix + window[0]
                    fiy = iy + window[1]
                else:
                    full_h = h
                    fiy = iy
                # row 0 of the FULL image is the TOP row (north-up); flip to
                # south-up indices against the full-image height
                siy = (full_h - 1) - fiy
                # GDAL_NODATA (tag 42113) pixels become NULL values — the
                # engine's masked-cell convention, matching the reference's
                # masked-array reads (demeter/raster/__init__.py)
                vals = arr.astype(np.float64).ravel()
                nd = codecs.tiff_nodata_of(codecs._tiff_tags(blob)[1])
                if nd is not None:
                    vals = np.where(vals == nd, np.nan, vals)
                # world coords: the decoder already shifted (ox, oy) to the
                # window's top-left corner, so centers derive from the
                # window-LOCAL offsets (iy counts down from the top, ry < 0)
                out.append(
                    pd.DataFrame(
                        {
                            "doc_id": d,
                            "ix": ix.ravel().astype("int64"),
                            "iy": siy.ravel().astype("int64"),
                            "value": vals,
                            "cx": ox + (np.mgrid[0:h, 0:w][1].ravel() + 0.5) * rx,
                            "cy": oy + (iy.ravel() + 0.5) * ry,
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                {c: [] for c in ("doc_id", "ix", "iy", "value", "cx", "cy")}
            )

    return media_df.select("doc_id", "payload").mapInPandas(
        _cells,
        "doc_id BIGINT, ix BIGINT, iy BIGINT, value DOUBLE, cx DOUBLE, cy DOUBLE",
    )


TIFF_ORACLE_SQL = """
    SELECT doc_id,
           CAST(doc_id % 37 + 4 AS INT) AS width,
           CAST(doc_id % 23 + 4 AS INT) AS height,
           CASE WHEN doc_id % 8 = 6 THEN 'uint8'
                ELSE CASE doc_id % 4 WHEN 0 THEN 'uint8' WHEN 1 THEN 'uint16'
                     WHEN 2 THEN 'int32' ELSE 'float32' END END AS dtype,
           CAST(doc_id % 100 AS DOUBLE) * 0.5e0 AS ox,
           CAST(doc_id % 16 AS DOUBLE) * 0.25e0 AS oy,
           0.25e0 AS rx,
           -0.25e0 AS ry,
           CAST(CASE doc_id % 3 WHEN 0 THEN 4326 WHEN 1 THEN 4269
                ELSE 32610 END AS INT) AS epsg,
           CASE WHEN doc_id % 8 = 6 THEN
             -- JPEG-in-TIFF rows: 8x8 block-flat field, exact through DCT
             (SELECT CAST(sum(((x.x // 8) * 7 + (y.y // 8) * 13 + doc_id)
                             % 251) AS DOUBLE)
              FROM range(41) x(x), range(27) y(y)
              WHERE x.x < doc_id % 37 + 4 AND y.y < doc_id % 23 + 4)
           ELSE
             (SELECT CAST(sum((x.x * 7 + y.y * 13 + doc_id) % 251) AS DOUBLE)
              FROM range(41) x(x), range(27) y(y)
              WHERE x.x < doc_id % 37 + 4 AND y.y < doc_id % 23 + 4)
           END AS px_sum,
           CAST(doc_id % 251 AS DOUBLE) AS px_first,
           CASE WHEN doc_id % 8 = 6 THEN
             CAST((((doc_id % 37 + 3) // 8) * 7 + ((doc_id % 23 + 3) // 8)
                   * 13 + doc_id) % 251 AS DOUBLE)
           ELSE
             CAST(((doc_id % 37 + 3) * 7 + (doc_id % 23 + 3) * 13 + doc_id)
                  % 251 AS DOUBLE)
           END AS px_last,
           CAST(CASE WHEN doc_id % 6 = 4 AND doc_id % 8 <> 6
                THEN 1 ELSE 0 END AS INT)
             AS n_overviews
    FROM documents
"""
