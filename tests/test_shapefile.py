"""Shapefile (.shp) parser tests: pure-Python round-trips through our own
encoder, ring-winding polygon assembly, loud corruption failures, and the
end-to-end bundle flow (zip -> .shp + .dbf members -> joined feature table
-> cover-join consumption). Reference anchor: geopandas.read_file
(demeter/vector/usda/ssurgo.py:134) accepts shapefile bundles."""

import struct
import zipfile

import pytest

from demeter_spark.sources import shapefile as shp

SQ = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0), (0.0, 0.0)]  # CW (Y-up)
SQ_CCW = SQ[::-1]
HOLE = [(0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5), (0.5, 0.5)]  # CCW
FAR = [(p[0] + 10, p[1]) for p in SQ]


def test_point_and_null_roundtrip():
    t = shp.parse_shp(shp.encode_shp([(1, (3.5, -2.0)), (0, None), (1, (0.0, 7.0))]))
    assert t["rec_no"].tolist() == [1, 2, 3]
    assert t["wkt"].tolist() == ["POINT (3.5 -2.0)", None, "POINT (0.0 7.0)"]
    assert t["shape_type"].tolist() == ["Point", "Null", "Point"]
    assert t["xmin"].tolist()[0] == 3.5 and t["ymax"].tolist()[2] == 7.0


def test_multipoint_and_polyline():
    t = shp.parse_shp(
        shp.encode_shp(
            [
                (8, [(1.0, 2.0), (3.0, 4.0)]),
                (3, [[(0.0, 0.0), (1.0, 1.0), (2.0, 0.0)]]),
                (3, [[(0.0, 0.0), (1.0, 1.0)], [(5.0, 5.0), (6.0, 6.0)]]),
            ]
        )
    )
    assert t["wkt"].tolist() == [
        "MULTIPOINT (1.0 2.0, 3.0 4.0)",
        "LINESTRING (0.0 0.0, 1.0 1.0, 2.0 0.0)",
        "MULTILINESTRING ((0.0 0.0, 1.0 1.0), (5.0 5.0, 6.0 6.0))",
    ]
    assert (t["xmin"].tolist(), t["xmax"].tolist()) == ([1.0, 0.0, 0.0], [3.0, 2.0, 6.0])


def test_polygon_with_hole_and_multipolygon():
    t = shp.parse_shp(
        shp.encode_shp([(5, [SQ, HOLE]), (5, [SQ, HOLE, FAR]), (5, [SQ_CCW])])
    )
    ring = "(0.0 0.0, 0.0 2.0, 2.0 2.0, 2.0 0.0, 0.0 0.0)"
    hole = "(0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5)"
    far = "(10.0 0.0, 10.0 2.0, 12.0 2.0, 12.0 0.0, 10.0 0.0)"
    assert t["wkt"][0] == f"POLYGON ({ring}, {hole})"
    # second CW ring starts a NEW polygon; its preceding hole stays with sq
    assert t["wkt"][1] == f"MULTIPOLYGON (({ring}, {hole}), ({far}))"
    # leading CCW ring (malformed writer) still treated as an outer ring
    assert t["wkt"][2].startswith("POLYGON ((")
    assert (t["xmax"][0], t["xmax"][1]) == (2.0, 12.0)


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda b: b[:50], "no header"),
        (lambda b: struct.pack(">i", 1234) + b[4:], "file code"),
        (lambda b: b[:24] + struct.pack(">i", 10**6) + b[28:], "truncated shp"),
        (lambda b: b[:-20], "truncated|corrupt"),
    ],
)
def test_corruption_fails_loudly(mutate, match):
    blob = shp.encode_shp([(5, [SQ]), (1, (1.0, 1.0))])
    with pytest.raises(ValueError, match=match):
        shp.parse_shp(mutate(blob))


def test_unclosed_ring_and_bad_shape_type_rejected():
    open_ring = [(0.0, 0.0), (0.0, 2.0), (2.0, 2.0), (2.0, 0.0)]
    with pytest.raises(ValueError, match="unclosed"):
        shp.parse_shp(shp.encode_shp([(5, [open_ring])]))
    blob = bytearray(shp.encode_shp([(1, (1.0, 1.0))]))
    struct.pack_into("<i", blob, 108, 31)  # MultiPatch: unsupported
    with pytest.raises(ValueError, match="unsupported shape type 31"):
        shp.parse_shp(bytes(blob))


def test_bundle_end_to_end(spark, tmp_path):
    """zip(.shp + .dbf) -> extract -> parse both -> (src, rec_no) join ->
    the joined features drive the standard cover join downstream."""
    from pyspark.sql import functions as F

    from demeter_spark.operators.joins import spatial_join
    from demeter_spark.sources.archives import dbf_records, extract_members, read_archives

    def make_dbf(recs, fields):
        hdr = struct.pack("<BBBBIHH20x", 3, 26, 1, 1, len(recs),
                          33 + 32 * len(fields), 1 + sum(ln for _, ln in fields))
        desc = b"".join(
            name.encode().ljust(11, b"\x00") + b"C" + b"\x00" * 4
            + bytes([ln]) + b"\x00" * 15
            for name, ln in fields
        )
        body = b"".join(
            b" " + b"".join(v.encode().ljust(ln) for v, (_, ln) in zip(rec, fields))
            for rec in recs
        )
        return hdr + desc + b"\x0d" + body

    shp_blob = shp.encode_shp([(5, [SQ]), (5, [FAR]), (0, None)])
    dbf_blob = make_dbf(
        [("A1", "corn"), ("A2", "soy"), ("A3", "void")],
        [("PARCEL", 4), ("CROP", 6)],
    )
    with zipfile.ZipFile(tmp_path / "parcels.zip", "w") as zf:
        zf.writestr("parcels.shp", shp_blob)
        zf.writestr("parcels.dbf", dbf_blob)

    members = extract_members(read_archives(spark, str(tmp_path)))
    feats = shp.with_attributes(
        shp.shp_records(members.filter("member LIKE '%.shp'")),
        dbf_records(members.filter("member LIKE '%.dbf'")),
    ).select(
        F.expr("fields['PARCEL']").alias("parcel_id"),
        "shape_type", "wkt", "xmin", "ymin", "xmax", "ymax",
    )
    rows = {r["parcel_id"]: r for r in feats.collect()}
    assert set(rows) == {"A1", "A2", "A3"}
    assert rows["A1"]["wkt"].startswith("POLYGON ((0.0 0.0")
    assert rows["A3"]["shape_type"] == "Null" and rows["A3"]["wkt"] is None

    # the cover join keys parcels by int64 (the scale-correct dimension
    # key) — normalize the string attribute to a surrogate, join back after
    parcels = feats.filter("wkt IS NOT NULL").select(
        F.xxhash64("parcel_id").alias("parcel_id"),
        F.col("parcel_id").alias("parcel_name"),
        F.col("wkt").alias("geom_wkt"),
    )
    names = {r["parcel_id"]: r["parcel_name"] for r in parcels.collect()}
    pts = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 11.0, 1.5), (3, 50.0, 50.0)],
        "pid INT, lon DOUBLE, lat DOUBLE",
    )
    joined = spatial_join(
        pts, parcels.select("parcel_id", "geom_wkt"), res=7
    ).select("pid", "parcel_id")
    got = {(r["pid"], names[r["parcel_id"]]) for r in joined.collect()}
    assert got == {(1, "A1"), (2, "A2")}


def test_zm_variants_decode_as_2d():
    """Z/M record layouts carry z/m payload AFTER the XY block; the decode
    must emit identical 2-D WKT and preserve the type suffix."""
    flat = shp.parse_shp(
        shp.encode_shp([(1, (3.0, 4.0)), (5, [SQ, HOLE]), (8, [(1.0, 2.0), (3.0, 4.0)]), (3, [[(0.0, 0.0), (1.0, 1.0)]])])
    )
    for zoff, suffix in ((10, "Z"), (20, "M")):
        t = shp.parse_shp(
            shp.encode_shp(
                [
                    (1 + zoff, (3.0, 4.0)),
                    (5 + zoff, [SQ, HOLE]),
                    (8 + zoff, [(1.0, 2.0), (3.0, 4.0)]),
                    (3 + zoff, [[(0.0, 0.0), (1.0, 1.0)]]),
                ]
            )
        )
        assert t["wkt"].tolist() == flat["wkt"].tolist()
        assert t["shape_type"].tolist() == [
            "Point" + suffix, "Polygon" + suffix, "MultiPoint" + suffix, "PolyLine" + suffix,
        ]


def test_shx_windowed_read_touches_only_requested_records():
    """COG-style windowed-read proof: corrupt every byte OUTSIDE the
    requested records' ranges; the windowed decode still succeeds and
    matches the full parse, while a full parse of the corrupted blob
    fails."""
    shapes = [(5, [SQ]), (1, (1.5, 2.5)), (5, [FAR]), (8, [(9.0, 9.0), (8.0, 8.0)])]
    blob = shp.encode_shp(shapes)
    idx = shp.parse_shx(shp.encode_shx(blob))
    assert [r for r, _, _ in idx] == [1, 2, 3, 4]
    full = shp.parse_shp(blob)

    want = [2, 4]
    keep = set()
    entries = {r: (off, ln) for r, off, ln in idx}
    for r in want:
        off, ln = entries[r]
        keep.update(range(off, off + 8 + ln))
    corrupted = bytes(
        b if i in keep or i < 100 else 0xFF for i, b in enumerate(blob)
    )
    with pytest.raises(ValueError):
        shp.parse_shp(corrupted)
    t = shp.parse_shp_window(corrupted, idx, want)
    assert t["rec_no"].tolist() == want
    assert t["wkt"].tolist() == [full["wkt"][1], full["wkt"][3]]
    with pytest.raises(ValueError, match="not in shx index"):
        shp.parse_shp_window(blob, idx, [9])


def test_shapefile_hypothesis_roundtrip():
    """Fuzz: random geometries of every supported family survive the
    encode->parse round-trip with exact coordinates (doubles are carried
    verbatim), and truncation anywhere past the header fails loudly or
    returns only complete records (never garbage)."""
    from hypothesis import given, settings, strategies as st

    coord = st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
    pt = st.tuples(coord, coord)

    def ring(pts):
        closed = pts + [pts[0]]
        return closed

    shape = st.one_of(
        st.tuples(st.just(1), pt),
        st.tuples(st.just(8), st.lists(pt, min_size=1, max_size=5)),
        st.tuples(st.just(3), st.lists(st.lists(pt, min_size=2, max_size=5), min_size=1, max_size=3)),
        st.tuples(
            st.just(5),
            st.lists(
                st.lists(pt, min_size=3, max_size=6, unique=True).map(ring),
                min_size=1,
                max_size=3,
            ),
        ),
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(shape, min_size=1, max_size=6), st.data())
    def run(shapes, data):
        blob = shp.encode_shp(shapes)
        t = shp.parse_shp(blob)
        assert len(t) == len(shapes)
        # coordinates round-trip exactly: every encoded point appears in wkt
        for (stype, payload), wkt in zip(shapes, t["wkt"]):
            if stype == 1:
                assert shp._fmt(payload[0]) in wkt
            elif stype == 8:
                assert all(shp._fmt(x) in wkt for x, _ in payload)
            else:
                assert all(shp._fmt(x) in wkt for part in payload for x, _ in part)
        # index round-trip agrees with the sequential walk
        idx = shp.parse_shx(shp.encode_shx(blob))
        w = shp.parse_shp_window(blob, idx, [r for r, _, _ in idx])
        assert w["wkt"].tolist() == t["wkt"].tolist()
        # truncation: cut inside the record region
        cut = data.draw(st.integers(min_value=100, max_value=len(blob) - 1))
        try:
            partial = shp.parse_shp(blob[:cut])
            assert partial["wkt"].tolist() == t["wkt"].tolist()[: len(partial)]
        except ValueError:
            pass

    run()
