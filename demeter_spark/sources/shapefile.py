"""ESRI shapefile (.shp) geometry reader — SURVEY.md §2.1 source surface.

Capability parity: the reference reads any fiona/GDAL vector format through
``geopandas.read_file`` (demeter/vector/usda/ssurgo.py:134, demeter/raster/
usgs/hydrography.py:170) — shapefiles included; SSURGO and NHD deliveries
ship as .shp/.shx/.dbf/.prj bundles inside zips. This module implements the
.shp main-file format from the public ESRI whitepaper (July 1998) with the
stdlib only, the same posture as the TIFF/JPEG/PNG codecs: a 100-byte
big/little-endian mixed header, then records of a big-endian (number,
content-length) prefix and a little-endian geometry body.

Supported shape types (the vector families the engine's query surface
consumes): 0 Null, 1 Point, 3 PolyLine, 5 Polygon, 8 MultiPoint, plus
their Z (11/13/15/18) and M (21/23/25/28) variants — the z/m payload sits
after the XY block and is skipped; SSURGO deliveries commonly ship
PolygonZ. Geometry is emitted as 2-D WKT in the same shape the GeoJSON
source produces, so every downstream operator (cover join, zonal mask,
dissolve) is format-agnostic.

Polygon ring assembly follows the shapefile convention: outer rings wind
clockwise (negative shoelace area in a Y-up frame), holes counter-clockwise
and FOLLOW their outer ring in record order; a leading CCW ring is treated
as an outer ring (common-reader leniency for malformed writers). Multiple
outer rings promote the record to MULTIPOLYGON.

Spark wiring mirrors archives.dbf_records: member blobs in, one Arrow batch
of (src, rec_no, shape_type, wkt, bbox) rows out via mapInPandas — bytes
never become per-row Python objects on the JVM side, and a million-bundle
corpus parses embarrassingly parallel. ``rec_no`` is the spec's 1-based
record number: the implicit join key to the .dbf sidecar's attribute rows
(archives.dbf_records emits the matching rec_no).
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame

SHAPE_NAMES = {
    0: "Null", 1: "Point", 3: "PolyLine", 5: "Polygon", 8: "MultiPoint",
    11: "PointZ", 13: "PolyLineZ", 15: "PolygonZ", 18: "MultiPointZ",
    21: "PointM", 23: "PolyLineM", 25: "PolygonM", 28: "MultiPointM",
}
# Z (11..18) and M (21..28) variants append z/m ranges+arrays AFTER the XY
# block, so the 2-D decode reads the same prefix; geometry is emitted 2-D
# (the engine's planar cover/PIP surface), the suffix preserved in
# shape_type. SSURGO deliveries commonly ship PolygonZ.
_BASE_TYPE = {11: 1, 13: 3, 15: 5, 18: 8, 21: 1, 23: 3, 25: 5, 28: 8}

_FILE_CODE = 9994
_VERSION = 1000


def _fmt(x: float) -> str:
    """Coordinate -> WKT text. repr() is the shortest exact round-trip form
    (the convention the codebase's Python-side WKT uses); integral values
    render as '1.0' to match CAST(double AS STRING) for the common case."""
    return repr(float(x))


def _ring_wkt(pts: list[tuple[float, float]]) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"


def _signed_area2(pts: list[tuple[float, float]]) -> float:
    """Twice the shoelace signed area, CCW-positive (Y-up)."""
    s = 0.0
    for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
        s += x0 * y1 - x1 * y0
    return s


def _parts_points(body: bytes, base: int) -> tuple[list[list[tuple[float, float]]], int]:
    """Decode the shared PolyLine/Polygon layout: box, numParts, numPoints,
    parts[], points[]. Returns the per-part point lists."""
    n_parts, n_points = struct.unpack_from("<ii", body, base + 36)
    if n_parts < 0 or n_points < 0:
        raise ValueError(f"corrupt shp record: {n_parts} parts / {n_points} points")
    need = base + 44 + 4 * n_parts + 16 * n_points
    if need > len(body):
        raise ValueError(
            f"truncated shp record: needs {need} bytes, has {len(body)}"
        )
    parts = list(struct.unpack_from(f"<{n_parts}i", body, base + 44))
    off = base + 44 + 4 * n_parts
    xy = struct.unpack_from(f"<{2 * n_points}d", body, off)
    pts = [(xy[2 * i], xy[2 * i + 1]) for i in range(n_points)]
    bounds = parts + [n_points]
    if any(b < 0 or b > n_points for b in parts) or any(
        a > b for a, b in zip(bounds, bounds[1:])
    ):
        raise ValueError(f"corrupt shp record: part offsets {parts}")
    return [pts[a:b] for a, b in zip(bounds, bounds[1:])], n_points


def _polygon_wkt(rings: list[list[tuple[float, float]]]) -> str:
    """Group rings into polygons by winding + sequence (see module doc)."""
    polys: list[list[str]] = []
    for ring in rings:
        if len(ring) < 4:
            raise ValueError(f"degenerate polygon ring of {len(ring)} points")
        is_hole = _signed_area2(ring) > 0 and polys
        if is_hole:
            polys[-1].append(_ring_wkt(ring))
        else:
            polys.append([_ring_wkt(ring)])
    if len(polys) == 1:
        return "POLYGON (" + ", ".join(polys[0]) + ")"
    return (
        "MULTIPOLYGON ("
        + ", ".join("(" + ", ".join(p) + ")" for p in polys)
        + ")"
    )


def parse_shp(blob: bytes) -> pd.DataFrame:
    """.shp main file -> DataFrame (rec_no, shape_type, wkt, xmin, ymin,
    xmax, ymax). Null shapes carry NULL wkt/bbox (P11 geometry-type guard
    semantics downstream). Fails loudly on header/record corruption — the
    contract every codec in this engine follows."""
    if len(blob) < 100:
        raise ValueError(f"corrupt shp: {len(blob)} bytes is no header")
    code = struct.unpack_from(">i", blob, 0)[0]
    if code != _FILE_CODE:
        raise ValueError(f"corrupt shp: file code {code} != {_FILE_CODE}")
    file_len = struct.unpack_from(">i", blob, 24)[0] * 2  # 16-bit words
    if file_len > len(blob):
        raise ValueError(f"truncated shp: header says {file_len}, have {len(blob)}")
    version, _gtype = struct.unpack_from("<ii", blob, 28)
    if version != _VERSION:
        raise ValueError(f"unsupported shp version {version}")

    rows: list[tuple] = []
    pos = 100
    while pos < file_len:
        row, pos = _decode_record(blob, pos)
        rows.append(row)
    return pd.DataFrame(
        rows,
        columns=["rec_no", "shape_type", "wkt", "xmin", "ymin", "xmax", "ymax"],
    )


def _decode_record(blob: bytes, pos: int) -> tuple[tuple, int]:
    """Decode ONE record at byte ``pos``; returns (row, next_pos). Reads
    nothing outside [pos, next_pos) — the windowed-read contract
    parse_shp_window relies on."""
    if pos + 12 > len(blob):
        raise ValueError(f"truncated shp record header at {pos}")
    rec_no, content_words = struct.unpack_from(">ii", blob, pos)
    body_end = pos + 8 + content_words * 2
    if content_words < 2 or body_end > len(blob):
        raise ValueError(
            f"corrupt shp record {rec_no}: {content_words} words at {pos}"
        )
    base = pos + 8
    stype = struct.unpack_from("<i", blob, base)[0]
    name = SHAPE_NAMES.get(stype)
    kind = _BASE_TYPE.get(stype, stype)
    if kind == 0:
        row = (rec_no, "Null", None, None, None, None, None)
    elif kind == 1:
        x, y = struct.unpack_from("<dd", blob, base + 4)
        row = (rec_no, name, f"POINT ({_fmt(x)} {_fmt(y)})", x, y, x, y)
    elif kind == 8:
        parts, _ = _mpoint(blob[pos + 8 : body_end])
        wkt = "MULTIPOINT (" + ", ".join(
            f"{_fmt(x)} {_fmt(y)}" for x, y in parts
        ) + ")"
        row = (rec_no, name, wkt, *_bbox(parts))
    elif kind in (3, 5):
        rings, _ = _parts_points(blob, base)
        allpts = [p for r in rings for p in r]
        if kind == 3:
            wkt = (
                "LINESTRING " + _ring_wkt(rings[0])
                if len(rings) == 1
                else "MULTILINESTRING ("
                + ", ".join(_ring_wkt(r) for r in rings)
                + ")"
            )
        else:
            for r in rings:
                if r[0] != r[-1]:
                    raise ValueError(f"unclosed polygon ring in record {rec_no}")
            wkt = _polygon_wkt(rings)
        row = (rec_no, name, wkt, *_bbox(allpts))
    else:
        raise ValueError(f"unsupported shape type {stype} in record {rec_no}")
    return row, body_end


def _mpoint(body: bytes) -> tuple[list[tuple[float, float]], int]:
    n = struct.unpack_from("<i", body, 36)[0]
    if n < 0 or 40 + 16 * n > len(body):
        raise ValueError(f"corrupt multipoint: {n} points in {len(body)} bytes")
    xy = struct.unpack_from(f"<{2 * n}d", body, 40)
    return [(xy[2 * i], xy[2 * i + 1]) for i in range(n)], n


def _bbox(pts: list[tuple[float, float]]) -> tuple[float, float, float, float]:
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    return min(xs), min(ys), max(xs), max(ys)


# --- .shx index: windowed record access ------------------------------------


def parse_shx(blob: bytes) -> list[tuple[int, int, int]]:
    """.shx index file -> [(rec_no, offset_bytes, content_bytes), ...].

    Same 100-byte header as the .shp; then one big-endian (offset_words,
    length_words) pair per record. The index is what lets a remote reader
    range-request single records — the vector analogue of the COG
    tile-offset table (codecs._tiff_ifds)."""
    if len(blob) < 100:
        raise ValueError(f"corrupt shx: {len(blob)} bytes is no header")
    if struct.unpack_from(">i", blob, 0)[0] != _FILE_CODE:
        raise ValueError("corrupt shx: bad file code")
    file_len = struct.unpack_from(">i", blob, 24)[0] * 2
    if file_len > len(blob) or (file_len - 100) % 8:
        raise ValueError(f"corrupt shx: file length {file_len} vs {len(blob)}")
    out = []
    for i in range((file_len - 100) // 8):
        off_w, len_w = struct.unpack_from(">ii", blob, 100 + 8 * i)
        out.append((i + 1, off_w * 2, len_w * 2))
    return out


def parse_shp_window(
    blob: bytes, index: list[tuple[int, int, int]], rec_nos: list[int]
) -> pd.DataFrame:
    """Decode ONLY the requested records via their .shx index entries —
    no byte outside each record's [offset, offset + 8 + length) range is
    parsed (proven by an outside-corruption test, the same contract as
    COG windowed reads). ``blob`` may be a sparse buffer holding just
    those ranges."""
    want = {int(r) for r in rec_nos}
    entries = {r: (off, ln) for r, off, ln in index}
    missing = sorted(want - entries.keys())
    if missing:
        raise ValueError(f"records not in shx index: {missing}")
    rows = []
    for r in sorted(want):
        off, _ln = entries[r]
        row, _end = _decode_record(blob, off)
        if row[0] != r:
            raise ValueError(f"shx offset {off} holds record {row[0]}, not {r}")
        rows.append(row)
    return pd.DataFrame(
        rows,
        columns=["rec_no", "shape_type", "wkt", "xmin", "ymin", "xmax", "ymax"],
    )


def encode_shx(shp_blob: bytes) -> bytes:
    """Derive the .shx index from a .shp blob (writer-side sidecar)."""
    file_len = struct.unpack_from(">i", shp_blob, 24)[0] * 2
    entries = []
    pos = 100
    while pos < file_len:
        content_words = struct.unpack_from(">i", shp_blob, pos + 4)[0]
        entries.append(struct.pack(">ii", pos // 2, content_words))
        pos += 8 + content_words * 2
    header = shp_blob[:24] + struct.pack(">i", (100 + 8 * len(entries)) // 2) + shp_blob[28:100]
    return header + b"".join(entries)


# --- encoder (test fixture / round-trip surface, same role as tiff_encode) ---


def _zm_suffix(n: int, has_z: bool, has_m: bool) -> bytes:
    """Zero-valued (range, array) blocks the Z/M record layouts append."""
    block = struct.pack(f"<{n + 2}d", *([0.0] * (n + 2)))
    return (block if has_z else b"") + (block if has_m else b"")


def encode_shp(shapes: list[tuple[int, object]]) -> bytes:
    """Build a .shp blob from (shape_type, payload) pairs:
    0 -> None; 1 -> (x, y); 8 -> [(x, y), ...];
    3/5 -> [[(x, y), ...] per part/ring]. Z/M variants take the same 2-D
    payload; zero-valued z/m ranges+arrays are appended per the spec's
    record layouts (what the parser skips)."""
    records = []
    allpts: list[tuple[float, float]] = []
    for i, (stype, payload) in enumerate(shapes, start=1):
        kind = _BASE_TYPE.get(stype, stype)
        has_z = 11 <= stype <= 18
        has_m = stype >= 11
        if kind == 0:
            body = struct.pack("<i", 0)
        elif kind == 1:
            x, y = payload
            body = struct.pack("<i", stype) + struct.pack("<dd", x, y)
            if has_z:
                body += struct.pack("<d", 0.0)
            if has_m:
                body += struct.pack("<d", 0.0)
            allpts.append((x, y))
        elif kind == 8:
            pts = list(payload)
            allpts += pts
            bx = _bbox(pts)
            body = struct.pack("<i4di", stype, *bx, len(pts)) + b"".join(
                struct.pack("<dd", x, y) for x, y in pts
            ) + _zm_suffix(len(pts), has_z, has_m)
        elif kind in (3, 5):
            parts = [list(p) for p in payload]
            pts = [p for part in parts for p in part]
            allpts += pts
            bx = _bbox(pts)
            offsets, acc = [], 0
            for part in parts:
                offsets.append(acc)
                acc += len(part)
            body = (
                struct.pack("<i4dii", stype, *bx, len(parts), len(pts))
                + struct.pack(f"<{len(parts)}i", *offsets)
                + b"".join(struct.pack("<dd", x, y) for x, y in pts)
                + _zm_suffix(len(pts), has_z, has_m)
            )
        else:
            raise ValueError(f"unsupported shape type {stype}")
        records.append(struct.pack(">ii", i, len(body) // 2) + body)
    content = b"".join(records)
    bx = _bbox(allpts) if allpts else (0.0, 0.0, 0.0, 0.0)
    header = (
        struct.pack(">i5i i", _FILE_CODE, 0, 0, 0, 0, 0, (100 + len(content)) // 2)
        + struct.pack("<ii", _VERSION, shapes[0][0] if shapes else 0)
        + struct.pack("<4d", *bx)
        + struct.pack("<4d", 0.0, 0.0, 0.0, 0.0)  # Z/M ranges unused
    )
    assert len(header) == 100
    return header + content


# --- Spark wiring -----------------------------------------------------------


def shp_records(
    members: DataFrame,
    data_col: str = "data",
    src_cols: tuple[str, ...] = ("src", "member"),
) -> DataFrame:
    """Extracted .shp member blobs -> geometry rows
    (src..., rec_no, shape_type, wkt, xmin..ymax) via ONE Arrow kernel.
    Join to ``archives.dbf_records`` on (src, rec_no) for attributes."""

    def _records(batches):
        for pdf in batches:
            frames = []
            for i in range(len(pdf)):
                t = parse_shp(bytes(pdf[data_col].iloc[i]))
                for c in src_cols:
                    t.insert(0, c, pdf[c].iloc[i])
                frames.append(t)
            yield (
                pd.concat(frames, ignore_index=True)
                if frames
                else pd.DataFrame(
                    columns=[*src_cols, "rec_no", "shape_type", "wkt",
                             "xmin", "ymin", "xmax", "ymax"]
                )
            )

    schema = (
        ", ".join(f"{c} STRING" for c in src_cols)
        + ", rec_no BIGINT, shape_type STRING, wkt STRING,"
        " xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE"
    )
    return members.select(*src_cols, data_col).mapInPandas(_records, schema)


def with_attributes(
    geoms: DataFrame, attrs: DataFrame, src_col: str = "src"
) -> DataFrame:
    """The shapefile bundle join: .shp geometry rows x .dbf attribute rows
    on (bundle, rec_no) — both sides came out of the same zip, so the join
    key co-partitions trivially; at corpus scale this is one shuffle keyed
    by (src, rec_no) with no skew (rec_no is dense per bundle)."""
    return geoms.join(
        attrs.select(src_col, "rec_no", "fields"), [src_col, "rec_no"]
    )
