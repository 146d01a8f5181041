"""HTTP catalog clients (SURVEY.md §2.1 S10 OData search, S11 ArcGIS WBD).

Capability parity with the reference's two network catalog lookups:

- **OData product search** (demeter/raster/sentinel2/utils/search.py:23-71):
  assemble the Copernicus-style ``$filter`` condition string per
  (tile, orbit, year, month), GET the products endpoint, decode each item's
  ``S3Path`` to a bucket-relative key. This client additionally follows
  ``@odata.nextLink`` pagination (the reference asserts it never needs to).
- **ArcGIS WBD spatial query** (demeter/raster/usgs/hydrography.py:358-412):
  combined bbox -> esriGeometryPolygon envelope params -> GeoJSON feature
  response -> EXACT intersects refine against the input geometries (the
  reference's shapely ``intersects`` step, here geom.parts_intersect) ->
  HU4 code list, with the reference's two ValueError cases (no regions /
  geometry outside every region) reproduced.

stdlib ``urllib`` only (no requests); tests drive the full protocol against
a local ``http.server`` fixture (tests/test_catalog.py) — query assembly,
pagination, decode and refine are all exercised; only the public endpoints
are unreachable from this sandbox.

Spark posture: catalog responses are DIMENSION metadata (tens to thousands
of rows). The fetch happens once, driver-side — exactly like the reference —
and the result becomes a small DataFrame that broadcasts into data-plane
joins. The data plane never issues HTTP calls per row.
"""

from __future__ import annotations

import calendar
import json
import urllib.parse
import urllib.request
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession


def _get_json(url: str, params: dict | None = None, timeout: float = 30.0) -> dict:
    # non-2xx raises urllib.error.HTTPError from urlopen itself; no dead
    # status check needed here (ADVICE r03)
    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _check_next_link(nxt: str, origin_url: str) -> str:
    """Guard pagination follow-ups: a catalog response controls
    @odata.nextLink, so an attacker-controlled page could redirect the
    client to an arbitrary scheme (urllib accepts file://) or host — an
    SSRF/local-read vector (ADVICE r03). Only http(s) links on the SAME
    host as the original endpoint are followed."""
    got = urllib.parse.urlparse(nxt)
    want = urllib.parse.urlparse(origin_url)
    if got.scheme not in ("http", "https") or got.netloc != want.netloc:
        raise ValueError(
            f"refusing to follow @odata.nextLink off-origin: {nxt!r}"
            f" (endpoint host {want.netloc!r})"
        )
    return nxt


# ---------------------------------------------------------------------------
# S10: OData product search (search.py parity)


def odata_filter(
    tile_id: str,
    relative_orbit_number: int,
    year: int,
    month: int,
    collection: str = "SENTINEL-2",
    product_type: str = "S2MSI2A",
) -> str:
    """The reference's ``_odata_query`` condition string, verbatim semantics
    (search.py:55-71): collection, month date window, productType / tileId /
    relativeOrbitNumber attribute predicates, joined with ' and '."""
    assert 1 <= month <= 12
    _, last_day = calendar.monthrange(year, month)
    conditions = [
        f"Collection/Name eq '{collection}'",
        f"ContentDate/Start ge {year}-{month:02}-01",
        f"ContentDate/End le {year}-{month:02}-{last_day:02}",
        "Attributes/OData.CSC.StringAttribute/any(att:att/Name eq 'productType'"
        f" and att/OData.CSC.StringAttribute/Value eq '{product_type}')",
        "Attributes/OData.CSC.StringAttribute/any(att:att/Name eq 'tileId'"
        f" and att/OData.CSC.StringAttribute/Value eq '{tile_id}')",
        "Attributes/OData.CSC.IntegerAttribute/any(att:att/Name eq"
        " 'relativeOrbitNumber' and att/OData.CSC.IntegerAttribute/Value eq"
        f" {relative_orbit_number})",
    ]
    return " and ".join(conditions)


def odata_find_keys(
    endpoint: str,
    tile_id: str,
    relative_orbit_number: int,
    year: int,
    month: int,
    bucket: str = "eodata",
    limit: int = 100,
    max_pages: int = 100,
) -> list[str]:
    """SAFE-file keys for one (tile, orbit, month) — search.py:23-52 with
    real pagination: follows @odata.nextLink instead of asserting the first
    page suffices. Keys are S3Path values with the /bucket/ prefix stripped;
    every key must end in .SAFE (reference invariant, kept as a check)."""
    keys: list[str] = []
    query = odata_filter(tile_id, relative_orbit_number, year, month)
    url = f"{endpoint}?{urllib.parse.urlencode({'$filter': query, '$top': str(limit)})}"
    for _ in range(max_pages):
        payload = _get_json(url)
        for item in payload.get("value", []):
            key = item["S3Path"]
            prefix = f"/{bucket}/"
            if key.startswith(prefix):
                key = key[len(prefix):]
            if not key.endswith(".SAFE"):
                raise ValueError(f"unexpected catalog key (not .SAFE): {key}")
            keys.append(key)
        nxt = payload.get("@odata.nextLink")
        if not nxt:
            return keys
        url = _check_next_link(nxt, endpoint)
    raise RuntimeError(f"OData pagination exceeded {max_pages} pages")


def odata_products_df(
    spark: SparkSession,
    endpoint: str,
    tiles: Iterable[tuple[str, int]],
    year: int,
    month: int,
    **kw,
) -> DataFrame:
    """find_safe_files (search.py:10-20) as a dimension DataFrame:
    (tile_id, orbit, s3_key) rows ready to broadcast into scan planning."""
    rows = [
        (tile_id, orbit, key)
        for tile_id, orbit in tiles
        for key in odata_find_keys(endpoint, tile_id, orbit, year, month, **kw)
    ]
    return spark.createDataFrame(
        rows, "tile_id STRING, orbit INT, s3_key STRING"
    )


# ---------------------------------------------------------------------------
# S11: ArcGIS WBD spatial query (hydrography.py parity)


def arcgis_query_params(
    bbox: tuple[float, float, float, float],
    out_fields: str = "HUC4,Name",
) -> dict:
    """The reference's WBD request params (hydrography.py:381-393): the
    combined bbox as an esriGeometryPolygon envelope ring, intersects
    relation, GeoJSON response."""
    x0, y0, x1, y1 = bbox
    rings = [[[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]]
    return {
        "geometry": json.dumps({"rings": rings}),
        "geometryType": "esriGeometryPolygon",
        "inSR": "4326",
        "spatialRel": "esriSpatialRelIntersects",
        "outFields": out_fields,
        "returnGeometry": "true",
        "f": "GeoJSON",
    }


def _feature_parts(feature: dict):
    """GeoJSON Polygon/MultiPolygon coordinates -> geom parts structure."""
    import numpy as np

    g = feature["geometry"]
    if g["type"] == "Polygon":
        polys = [g["coordinates"]]
    elif g["type"] == "MultiPolygon":
        polys = g["coordinates"]
    else:
        raise ValueError(f"unsupported WBD geometry type {g['type']}")
    parts = []
    for rings in polys:
        parts.append(
            [
                (
                    np.asarray([p[0] for p in ring], dtype=float),
                    np.asarray([p[1] for p in ring], dtype=float),
                )
                for ring in rings
            ]
        )
    return parts


def find_hu4_codes(
    parcels: DataFrame,
    service_url: str,
    wkt_col: str = "geom_wkt",
    id_col: str = "parcel_id",
) -> list[str]:
    """HU4 codes of WBD regions intersecting the parcel geometries —
    hydrography.py:358-412 end-to-end: combined bounding box (computed
    Spark-side), one envelope query (the service rejects large geometries,
    so the reference queries by bbox and refines locally), exact
    parts_intersect refine, and both reference error modes:
    no regions at all, or some parcel disjoint from every region."""
    from pyspark.sql import functions as F

    from demeter_spark.functions import geom

    geoms = [
        (r[id_col], geom.parse_wkt_polygons(r[wkt_col]))
        for r in parcels.select(id_col, wkt_col).collect()
    ]
    if not geoms:
        raise ValueError("No geometries provided")
    bounds = parcels.agg(
        F.min("xmin"), F.min("ymin"), F.max("xmax"), F.max("ymax")
    ).first()
    payload = _get_json(service_url, arcgis_query_params(tuple(bounds)))
    regions = []
    for feat in payload.get("features", []):
        props = feat.get("properties", {})
        code = props.get("huc4") or props.get("HUC4")
        regions.append((str(code), _feature_parts(feat)))

    # exact refine: the bbox query over-fetches; keep only regions that
    # intersect an actual parcel (reference's shapely intersects step)
    kept: list[str] = []
    kept_parts = []
    for code, parts in regions:
        if any(geom.parts_intersect(parts, g) for _, g in geoms):
            kept.append(code)
            kept_parts.append(parts)
    if not kept:
        raise ValueError(
            "No HU4 regions found for geometries. Are they in CONUS?"
        )
    orphans = [
        pid
        for pid, g in geoms
        if not any(geom.parts_intersect(parts, g) for parts in kept_parts)
    ]
    if orphans:
        raise ValueError(
            f"Can't find HU4 region for geometries at index: {orphans}. "
            "Are they in CONUS?"
        )
    return kept


def hu4_regions_df(
    spark: SparkSession, parcels: DataFrame, service_url: str, **kw
) -> DataFrame:
    """find_hu4_codes as a dimension DataFrame (one row per code) — the
    broadcast side that prunes which raster archives the data plane reads."""
    codes = find_hu4_codes(parcels, service_url, **kw)
    return spark.createDataFrame([(c,) for c in codes], "huc4 STRING")
