"""Albers equal-area conic transform (operators/reproject.py) — VERDICT r03
#5. The nearest-kernel warp through the conic is oracle-backed (see
__spark_entry__.reproject_albers); these tests carry the properties the
oracle can't: inverse consistency, the equal-area Jacobian, boundary-margin
robustness of the floor() oracle, and interpolating-kernel behavior through
trig (mirroring the reference's resampling tests,
/root/reference/tests/raster/utils/test_reprojection.py:19-101)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import reproject as rp

PARAMS = dict(phi1=8.0, phi2=24.0, phi0=16.0, lon0=18.0)
DST = rp.Grid(-1536000.0, -1280000.0, 32000.0, 32000.0, 96, 80)
SRC = rp.Grid(0.0, 0.0, 0.25, 0.25, 144, 128)


def _np_inverse(x, y):
    n, c, rho0 = rp.albers_constants(**PARAMS)
    ry = rho0 - y
    lon = PARAMS["lon0"] + np.arctan2(x, ry) / n / rp.DEG
    lat = np.arcsin((c - (x * x + ry * ry) * (n / rp.EARTH_R) ** 2) / (2 * n)) / rp.DEG
    return lon, lat


def test_forward_inverse_roundtrip(spark):
    """lon/lat -> meters -> lon/lat closes to sub-micron-degree error."""
    pts = spark.range(500).selectExpr(
        "0.1e0 + (id % 50) * 0.7e0 AS lon",
        "0.2e0 + (id div 50) * 3.1e0 AS lat",
    )
    fx, fy = rp.lonlat_to_albers(**PARAMS)(F.col("lon"), F.col("lat"))
    ix_, iy_ = rp.albers_to_lonlat(**PARAMS)(fx, fy)
    bad = pts.select(
        (F.abs(ix_ - F.col("lon")) + F.abs(iy_ - F.col("lat"))).alias("err")
    ).filter("err > 1e-9").count()
    assert bad == 0


def test_equal_area_jacobian():
    """The defining property: the forward map preserves area — the numeric
    Jacobian determinant over the sphere-metric scale equals 1 everywhere."""
    n, c, rho0 = rp.albers_constants(**PARAMS)

    def fwd(lon, lat):
        th = n * (lon - PARAMS["lon0"]) * rp.DEG
        rho = rp.EARTH_R / n * math.sqrt(c - 2 * n * math.sin(lat * rp.DEG))
        return rho * math.sin(th), rho0 - rho * math.cos(th)

    h = 1e-5
    for lon in (2.0, 18.0, 33.0):
        for lat in (1.0, 16.0, 30.0):
            x0, y0 = fwd(lon - h, lat)
            x1, y1 = fwd(lon + h, lat)
            x2, y2 = fwd(lon, lat - h)
            x3, y3 = fwd(lon, lat + h)
            det = abs(
                (x1 - x0) * (y3 - y2) - (x3 - x2) * (y1 - y0)
            ) / (2 * h * rp.DEG) ** 2
            sphere = rp.EARTH_R ** 2 * math.cos(lat * rp.DEG)
            assert abs(det / sphere - 1.0) < 1e-5, (lon, lat, det / sphere)


def test_oracle_boundary_margin():
    """Every destination pixel's source coordinate clears the cell boundary
    by >= 1e-6 cells, so the cross-engine floor() in the reproject_albers
    oracle is robust to ~1-ulp trig differences."""
    ix, iy = np.meshgrid(np.arange(DST.nx), np.arange(DST.ny), indexing="ij")
    x = DST.ox + (ix + 0.5) * DST.rx
    y = DST.oy + (iy + 0.5) * DST.ry
    lon, lat = _np_inverse(x, y)
    for g in (lon / SRC.rx, lat / SRC.ry):
        margin = np.abs(g - np.round(g)).min()
        # the docstring on _q_reproject_albers promises >= 5e-5 cells of
        # clearance; assert at that strength (measured ~5.5e-5)
        assert margin > 5e-5, margin
    # and the whole destination grid lands inside the source extent
    assert lon.min() > 0 and lon.max() < 36
    assert lat.min() > 0 and lat.max() < 32


def test_bilinear_through_conic_preserves_constant(spark):
    """Interpolating kernel through trig: weights are not bit-stable across
    engines, but a constant field must survive to float rounding (the
    renormalized weighted sum (sum wi*v)/(sum wi) reproduces v up to one
    rounding of each product) — the reference's constant-raster invariant."""
    const = spark.range(SRC.nx * SRC.ny).selectExpr(
        f"CAST(id % {SRC.nx} AS BIGINT) AS ix",
        f"CAST(id div {SRC.nx} AS BIGINT) AS iy",
        "CAST(7.5 AS DOUBLE) AS value",
    )
    out = rp.reproject_bilinear(
        const, SRC, DST, rp.albers_to_lonlat(**PARAMS), broadcast_src=True
    )
    assert out.count() == DST.nx * DST.ny
    assert out.filter("value IS NULL").count() == 0
    assert out.filter("abs(value - 7.5) > 1e-9").count() == 0


def test_bilinear_through_conic_tracks_smooth_field(spark):
    """On the smooth field v = lon, the conic bilinear warp must land within
    half a source cell of the analytically inverse-transformed longitude."""
    ramp = spark.range(SRC.nx * SRC.ny).selectExpr(
        f"CAST(id % {SRC.nx} AS BIGINT) AS ix",
        f"CAST(id div {SRC.nx} AS BIGINT) AS iy",
    ).selectExpr("ix", "iy", "(ix + 0.5e0) * 0.25e0 AS value")
    out = rp.reproject_bilinear(
        ramp, SRC, DST, rp.albers_to_lonlat(**PARAMS), broadcast_src=True
    ).collect()
    ix = np.array([r["ix"] for r in out])
    iy = np.array([r["iy"] for r in out])
    got = np.array([r["value"] for r in out], dtype=float)
    lon, _ = _np_inverse(
        DST.ox + (ix + 0.5) * DST.rx, DST.oy + (iy + 0.5) * DST.ry
    )
    assert np.nanmax(np.abs(got - lon)) < 0.125  # half a source cell


# the reproject_albers query-vs-oracle comparison (now covering both datums)
# lives in tests/test_ellipsoidal.py::test_albers_query_matches_oracle_both_datums
