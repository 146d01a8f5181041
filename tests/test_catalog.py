"""S10/S11 catalog clients driven end-to-end against a LOCAL http.server:
query assembly, pagination, decode, and the exact-intersects refine are all
exercised; only the public endpoints are out of sandbox reach."""

import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from demeter_spark.sources import catalog

RECEIVED = {}


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # keep pytest output clean
        pass

    def do_GET(self):
        parsed = urllib.parse.urlparse(self.path)
        q = dict(urllib.parse.parse_qsl(parsed.query))
        RECEIVED.setdefault(parsed.path, []).append(q)
        if parsed.path == "/odata/Products":
            page = q.get("page", "1")
            if page == "1":
                host = self.headers["Host"]
                nxt = (
                    f"http://{host}/odata/Products?"
                    + urllib.parse.urlencode({"page": "2", "$filter": q["$filter"]})
                )
                body = {
                    "value": [
                        {"S3Path": "/eodata/Sentinel-2/a/T14TQL_1.SAFE"},
                        {"S3Path": "/eodata/Sentinel-2/a/T14TQL_2.SAFE"},
                    ],
                    "@odata.nextLink": nxt,
                }
            else:
                body = {"value": [{"S3Path": "/eodata/Sentinel-2/a/T14TQL_3.SAFE"}]}
        elif parsed.path == "/wbd/query":
            def box(code, x0, y0, x1, y1, multi=False):
                ring = [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]
                g = (
                    {"type": "MultiPolygon", "coordinates": [[ring]]}
                    if multi
                    else {"type": "Polygon", "coordinates": [ring]}
                )
                return {
                    "type": "Feature",
                    "geometry": g,
                    "properties": {"huc4": code, "name": f"region {code}"},
                }

            body = {
                "type": "FeatureCollection",
                "features": [
                    box("0101", 9.5, 9.5, 10.5, 10.5),      # overlaps diamond
                    box("0199", 8.0, 8.0, 8.9, 8.9),        # bbox-only: refine drops
                    box("0103", 11.0, 9.5, 13.0, 10.5, multi=True),  # touches vertex
                    box("0104", 19.5, 19.5, 21.5, 21.5),    # contains rect parcel
                ],
            }
        else:
            self.send_response(404)
            self.end_headers()
            return
        data = json.dumps(body).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_odata_filter_matches_reference_shape():
    f = catalog.odata_filter("14TQL", 69, 2024, 2)
    assert f == (
        "Collection/Name eq 'SENTINEL-2'"
        " and ContentDate/Start ge 2024-02-01"
        " and ContentDate/End le 2024-02-29"  # leap year, calendar.monthrange
        " and Attributes/OData.CSC.StringAttribute/any(att:att/Name eq"
        " 'productType' and att/OData.CSC.StringAttribute/Value eq 'S2MSI2A')"
        " and Attributes/OData.CSC.StringAttribute/any(att:att/Name eq"
        " 'tileId' and att/OData.CSC.StringAttribute/Value eq '14TQL')"
        " and Attributes/OData.CSC.IntegerAttribute/any(att:att/Name eq"
        " 'relativeOrbitNumber' and att/OData.CSC.IntegerAttribute/Value eq 69)"
    )


def test_odata_pagination_and_key_decode(server, spark):
    keys = catalog.odata_find_keys(
        f"{server}/odata/Products", "14TQL", 69, 2024, 2
    )
    assert keys == [
        "Sentinel-2/a/T14TQL_1.SAFE",
        "Sentinel-2/a/T14TQL_2.SAFE",
        "Sentinel-2/a/T14TQL_3.SAFE",
    ]
    sent = RECEIVED["/odata/Products"][0]  # the initial (non-nextLink) request
    assert sent["$top"] == "100"
    assert "tileId" in sent["$filter"] and "'14TQL'" in sent["$filter"]

    df = catalog.odata_products_df(
        spark, f"{server}/odata/Products", [("14TQL", 69)], 2024, 2
    )
    assert df.count() == 3
    assert df.columns == ["tile_id", "orbit", "s3_key"]


def _parcels(spark, rows):
    return spark.createDataFrame(
        rows,
        "parcel_id BIGINT, geom_wkt STRING, xmin DOUBLE, ymin DOUBLE, "
        "xmax DOUBLE, ymax DOUBLE",
    )


def test_wbd_query_refines_bbox_hits(server, spark):
    """The envelope query over-fetches (region 0199 intersects the bbox but
    no geometry); the exact parts_intersect refine must drop it — the
    reference's shapely.intersects step (hydrography.py:396-399)."""
    parcels = _parcels(
        spark,
        [
            (1, "POLYGON ((8 10, 10 8, 12 10, 10 12, 8 10))", 8.0, 8.0, 12.0, 12.0),
            (2, "POLYGON ((20 20, 21 20, 21 21, 20 21, 20 20))", 20.0, 20.0, 21.0, 21.0),
        ],
    )
    codes = catalog.find_hu4_codes(parcels, f"{server}/wbd/query")
    assert codes == ["0101", "0103", "0104"]
    sent = RECEIVED["/wbd/query"][-1]
    assert sent["geometryType"] == "esriGeometryPolygon"
    assert sent["spatialRel"] == "esriSpatialRelIntersects"
    assert sent["f"] == "GeoJSON"
    rings = json.loads(sent["geometry"])["rings"]
    assert rings[0][0] == [8.0, 8.0] and rings[0][2] == [21.0, 21.0]

    df = catalog.hu4_regions_df(spark, parcels, f"{server}/wbd/query")
    assert {r["huc4"] for r in df.collect()} == {"0101", "0103", "0104"}


def test_wbd_orphan_geometry_raises(server, spark):
    parcels = _parcels(
        spark,
        [
            (1, "POLYGON ((8 10, 10 8, 12 10, 10 12, 8 10))", 8.0, 8.0, 12.0, 12.0),
            (9, "POLYGON ((40 40, 41 40, 41 41, 40 41, 40 40))", 40.0, 40.0, 41.0, 41.0),
        ],
    )
    with pytest.raises(ValueError, match=r"Can't find HU4 region.*\[9\]"):
        catalog.find_hu4_codes(parcels, f"{server}/wbd/query")


def test_parts_intersect_kernel():
    """Polygon-polygon intersects: overlap, containment both ways, touch,
    disjoint, and hole-awareness."""
    import numpy as np

    from demeter_spark.functions import geom

    def sq(x0, y0, x1, y1):
        return [[(np.array([x0, x1, x1, x0]), np.array([y0, y0, y1, y1]))]]

    a = sq(0, 0, 4, 4)
    assert geom.parts_intersect(a, sq(3, 3, 5, 5))      # overlap
    assert geom.parts_intersect(a, sq(1, 1, 2, 2))      # contains
    assert geom.parts_intersect(sq(1, 1, 2, 2), a)      # contained
    assert geom.parts_intersect(a, sq(4, 0, 6, 4))      # edge touch
    assert not geom.parts_intersect(a, sq(5, 5, 6, 6))  # disjoint
    # holed: square with hole (1,1)-(3,3); a probe fully inside the hole
    holed = [
        [
            (np.array([0.0, 4, 4, 0]), np.array([0.0, 0, 4, 4])),
            (np.array([1.0, 3, 3, 1]), np.array([1.0, 1, 3, 3])),
        ]
    ]
    assert not geom.parts_intersect(holed, sq(1.5, 1.5, 2.5, 2.5))
    assert geom.parts_intersect(holed, sq(0.5, 0.5, 2.5, 2.5))


def test_next_link_ssrf_guard():
    """ADVICE r03: @odata.nextLink from a (possibly compromised) catalog
    response must not redirect pagination off-origin or to a non-http
    scheme (urllib would happily open file://)."""
    import pytest as _pytest

    from demeter_spark.sources.catalog import _check_next_link

    origin = "http://localhost:8080/odata/v1/Products"
    ok = "http://localhost:8080/odata/v1/Products?$skip=100"
    assert _check_next_link(ok, origin) == ok
    for bad in (
        "file:///etc/passwd",
        "http://evil.example/odata",
        "https://localhost:9999/x",  # different port = different netloc
        "ftp://localhost:8080/x",
    ):
        with _pytest.raises(ValueError, match="off-origin"):
            _check_next_link(bad, origin)
