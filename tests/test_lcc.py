"""Ellipsoidal Lambert Conformal Conic (Snyder 15 + the 3-5
conformal-latitude inverse series) — the SPCS/StatePlane Lambert datum math
(reference: demeter/api.py to_crs through pyproj; no in-repo math).

What the oracle can't check, pinned here:
- forward/inverse round-trip to sub-micro-degree,
- CONFORMALITY: local scale isotropy (h = k) everywhere, and k = 1 exactly
  on both standard parallels — the defining properties, which the
  equal-area Albers in the same file deliberately fails,
- spherical degeneracy as e2 -> 0,
- the floor() margin of the v_lcc_ell oracle grid (absorbs the pow(_, 1/n)
  + trig ~ulp cross-engine budget).
"""

import math

import numpy as np
import pytest

from demeter_spark.operators import reproject as rp

P = dict(phi1=8.0, phi2=24.0, phi0=16.0, lon0=18.0)
A, E2 = rp.GRS80_A, rp.GRS80_E2


def _np_forward(lon, lat, a=A, e2=E2):
    n, f, rho0 = rp.lcc_ell_constants(a=a, e2=e2, **P)
    e = math.sqrt(e2)
    phi = lat * rp.DEG
    s = np.sin(phi)
    t = np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)
    rho = a * f * t**n
    th = n * (lon - P["lon0"]) * rp.DEG
    return rho * np.sin(th), rho0 - rho * np.cos(th)


def _np_inverse(x, y, a=A, e2=E2):
    n, f, rho0 = rp.lcc_ell_constants(a=a, e2=e2, **P)
    c2, c4, c6, c8 = rp._conformal_coeffs(e2)
    ry = rho0 - y
    lon = P["lon0"] + np.arctan2(x, ry) / n / rp.DEG
    rho = np.sqrt(x * x + ry * ry)
    t = (rho / (a * f)) ** (1.0 / n)
    chi = np.pi / 2 - 2 * np.arctan(t)
    lat = (
        chi
        + c2 * np.sin(2 * chi)
        + c4 * np.sin(4 * chi)
        + c6 * np.sin(6 * chi)
        + c8 * np.sin(8 * chi)
    ) / rp.DEG
    return lon, lat


def test_round_trip():
    lon, lat = np.meshgrid(
        np.linspace(1.0, 35.0, 18), np.linspace(1.0, 31.0, 16)
    )
    x, y = _np_forward(lon, lat)
    lon2, lat2 = _np_inverse(x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9  # series truncation ~e10 ~ 1e-10


def test_spark_matches_numpy(spark):
    """The Catalyst forward and inverse reproduce the numpy re-derivation
    to float-rounding (same constants, independent expression trees)."""
    import pandas as pd
    from pyspark.sql import functions as F

    lon = np.linspace(2.0, 34.0, 9)
    lat = np.linspace(2.0, 30.0, 9)
    grid = pd.DataFrame(
        {"lon": np.repeat(lon, 9), "lat": np.tile(lat, 9)}
    )
    df = spark.createDataFrame(grid)
    fx, fy = rp.lonlat_to_lcc_ell(**P)(F.col("lon"), F.col("lat"))
    ilon, ilat = rp.lcc_ell_to_lonlat(**P)(F.col("x"), F.col("y"))
    out = (
        df.select("lon", "lat", fx.alias("x"), fy.alias("y"))
        .select("lon", "lat", "x", "y", ilon.alias("lon2"), ilat.alias("lat2"))
        .toPandas()
    )
    ex, ey = _np_forward(out["lon"].values, out["lat"].values)
    assert np.abs(out["x"].values - ex).max() < 1e-6  # meters
    assert np.abs(out["y"].values - ey).max() < 1e-6
    assert np.abs(out["lon2"].values - out["lon"].values).max() < 1e-9
    assert np.abs(out["lat2"].values - out["lat"].values).max() < 1e-9


def _scale_factors(lon, lat, h=1e-7):
    """(k_parallel, h_meridian) by finite differences against the true
    ellipsoid arc lengths."""
    x0, y0 = _np_forward(lon - h, lat)
    x1, y1 = _np_forward(lon + h, lat)
    x2, y2 = _np_forward(lon, lat - h)
    x3, y3 = _np_forward(lon, lat + h)
    phi = lat * rp.DEG
    s2 = math.sin(phi) ** 2
    nu = A / math.sqrt(1 - E2 * s2)  # prime vertical radius
    rho_m = A * (1 - E2) / (1 - E2 * s2) ** 1.5  # meridian radius
    dp = math.hypot(x1 - x0, y1 - y0) / (2 * h * rp.DEG * nu * math.cos(phi))
    dm = math.hypot(x3 - x2, y3 - y2) / (2 * h * rp.DEG * rho_m)
    return dp, dm


def test_conformal_scale_isotropy_and_unit_parallels():
    """h = k everywhere (conformality) and k = 1 on both standard
    parallels, k < 1 between them, k > 1 outside — Snyder 15's defining
    behavior for the secant cone."""
    for lon in (3.0, 18.0, 33.0):
        for lat in (2.0, 8.0, 16.0, 24.0, 30.0):
            k, hm = _scale_factors(lon, lat)
            assert abs(k / hm - 1.0) < 1e-6, (lon, lat, k, hm)
    k1, _ = _scale_factors(10.0, P["phi1"])
    k2, _ = _scale_factors(25.0, P["phi2"])
    assert abs(k1 - 1.0) < 1e-7 and abs(k2 - 1.0) < 1e-7
    kin, _ = _scale_factors(18.0, 16.0)
    kout_s, _ = _scale_factors(18.0, 3.0)
    kout_n, _ = _scale_factors(18.0, 29.0)
    assert kin < 1.0 < min(kout_s, kout_n)


def test_albers_is_not_conformal_control():
    """Control for the isotropy test's power: the equal-area Albers at the
    same parallels must FAIL h = k away from the standard parallels."""
    h = 1e-7
    n, c, rho0, qp = rp.albers_ell_constants(**P)

    def fwd(lon, lat):
        e = math.sqrt(E2)
        phi = lat * rp.DEG
        s = math.sin(phi)
        q = (1 - E2) * (
            s / (1 - E2 * s * s)
            - 1.0 / (2 * e) * math.log((1 - e * s) / (1 + e * s))
        )
        rho = A / n * math.sqrt(c - n * q)
        th = n * (lon - P["lon0"]) * rp.DEG
        return rho * math.sin(th), rho0 - rho * math.cos(th)

    lon, lat = 18.0, 2.0
    x0, y0 = fwd(lon - h, lat)
    x1, y1 = fwd(lon + h, lat)
    x2, y2 = fwd(lon, lat - h)
    x3, y3 = fwd(lon, lat + h)
    phi = lat * rp.DEG
    s2 = math.sin(phi) ** 2
    nu = A / math.sqrt(1 - E2 * s2)
    rho_m = A * (1 - E2) / (1 - E2 * s2) ** 1.5
    k = math.hypot(x1 - x0, y1 - y0) / (2 * h * rp.DEG * nu * math.cos(phi))
    hm = math.hypot(x3 - x2, y3 - y2) / (2 * h * rp.DEG * rho_m)
    assert abs(k / hm - 1.0) > 1e-3  # equal-area: k*h = 1, not k = h


def test_spherical_degeneracy():
    """As e2 -> 0 the ellipsoidal forward converges to the spherical LCC
    closed form (n_s = ln(cos p1 / cos p2) / ln(tan(pi/4+p2/2)/tan(pi/4+p1/2)))."""
    e2 = 1e-14
    p1, p2, p0 = (math.radians(P[k]) for k in ("phi1", "phi2", "phi0"))
    ns = math.log(math.cos(p1) / math.cos(p2)) / math.log(
        math.tan(math.pi / 4 + p2 / 2) / math.tan(math.pi / 4 + p1 / 2)
    )
    fs = math.cos(p1) * math.tan(math.pi / 4 + p1 / 2) ** ns / ns
    rho0s = A * fs / math.tan(math.pi / 4 + p0 / 2) ** ns
    for lon, lat in ((5.0, 4.0), (18.0, 16.0), (30.0, 28.0)):
        x, y = _np_forward(np.float64(lon), np.float64(lat), e2=e2)
        rho = A * fs / math.tan(math.pi / 4 + math.radians(lat) / 2) ** ns
        th = ns * math.radians(lon - P["lon0"])
        xs, ys = rho * math.sin(th), rho0s - rho * math.cos(th)
        assert abs(x - xs) < 1e-4 and abs(y - ys) < 1e-4, (lon, lat)


def test_constants_reject_degenerate_parallels():
    with pytest.raises(ValueError):
        rp.lcc_ell_constants(phi1=24.0, phi2=8.0, phi0=16.0, lon0=18.0)
    with pytest.raises(ValueError):
        rp.lcc_ell_constants(phi1=-5.0, phi2=8.0, phi0=16.0, lon0=18.0)


def test_lcc_oracle_boundary_margin():
    """Every destination pixel's LCC source coordinate clears the cell
    boundary by >= 5e-5 cells (measured ~2.1e-4) and lands inside the
    source extent — the floor() robustness contract of the v_lcc_ell
    oracle column."""
    import __spark_entry__ as entry

    g = entry._LCC_DST
    ix, iy = np.meshgrid(np.arange(g["nx"]), np.arange(g["ny"]), indexing="ij")
    x = g["ox"] + (ix + 0.5) * g["rx"]
    y = g["oy"] + (iy + 0.5) * g["ry"]
    lon, lat = _np_inverse(x, y)
    for grid in (lon / 0.25, lat / 0.25):
        margin = np.abs(grid - np.round(grid)).min()
        assert margin > 5e-5, margin
    assert lon.min() > 0 and lon.max() < 36
    assert lat.min() > 0 and lat.max() < 32
