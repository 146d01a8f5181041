"""Horn terrain derivatives: DuckDB exact oracle, independent-physics
hillshade check, analytic ramp, plan shape.

Validation strategy mirrors the repo's codec/warp discipline: the integer
core (dzdx_num/dzdy_num/aspect_sector) is cross-engine EXACT and checked
against a DuckDB regroup oracle; the trig layer (slope/aspect/hillshade)
is checked against an independent numpy derivation built from a DIFFERENT
formulation (unit surface normal dotted with the unit light vector) so a
sign/convention slip in the fused Catalyst expression cannot self-confirm.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import terrain

W, H = 24, 18
CSX, CSY = 10.0, 10.0


def _dem_pdf() -> pd.DataFrame:
    rows = [
        (ix, iy, (ix * 37 + iy * 101 + (ix * iy) % 13) % 50)
        for ix in range(W)
        for iy in range(H)
    ]
    return pd.DataFrame(rows, columns=["ix", "iy", "v"])


@pytest.fixture(scope="module")
def dem(spark):
    return spark.createDataFrame(_dem_pdf()).localCheckpoint()


def test_horn_numerators_and_sector_match_duckdb(spark, dem):
    got = (
        terrain.slope_aspect(dem, CSX, CSY)
        .select("ix", "iy", "v", "dzdx_num", "dzdy_num", "aspect_sector")
        .orderBy("ix", "iy")
        .collect()
    )
    import duckdb

    con = duckdb.connect()
    con.register("dem", _dem_pdf())
    want = con.sql(
        """
        WITH offs AS (
          SELECT ox, oy FROM range(-1, 2) t1(ox), range(-1, 2) t2(oy)
        ), contrib AS (
          SELECT d.ix - o.ox AS ix, d.iy - o.oy AS iy,
                 d.v * (o.ox * (2 - abs(o.oy))) AS cx,
                 d.v * (o.oy * (2 - abs(o.ox))) AS cy,
                 CASE WHEN o.ox = 0 AND o.oy = 0 THEN d.v END AS center
          FROM dem d, offs o
        ), agg AS (
          SELECT ix, iy, sum(cx) AS dzdx_num, sum(cy) AS dzdy_num,
                 max(center) AS v, count(*) AS support
          FROM contrib GROUP BY ix, iy
        )
        SELECT ix, iy, v, dzdx_num, dzdy_num,
          CASE
            WHEN -dzdx_num = 0 AND -dzdy_num = 0 THEN NULL
            WHEN abs(-dzdy_num) <= abs(-dzdx_num) AND -dzdx_num > 0 AND -dzdy_num >= 0 THEN 0
            WHEN abs(-dzdy_num) >  abs(-dzdx_num) AND -dzdy_num > 0 AND -dzdx_num > 0 THEN 1
            WHEN abs(-dzdy_num) >  abs(-dzdx_num) AND -dzdy_num > 0 AND -dzdx_num <= 0 THEN 2
            WHEN abs(-dzdy_num) <= abs(-dzdx_num) AND -dzdx_num < 0 AND -dzdy_num > 0 THEN 3
            WHEN abs(-dzdy_num) <= abs(-dzdx_num) AND -dzdx_num < 0 AND -dzdy_num <= 0 THEN 4
            WHEN abs(-dzdy_num) >  abs(-dzdx_num) AND -dzdy_num < 0 AND -dzdx_num < 0 THEN 5
            WHEN abs(-dzdy_num) >  abs(-dzdx_num) AND -dzdy_num < 0 AND -dzdx_num >= 0 THEN 6
            WHEN abs(-dzdy_num) <= abs(-dzdx_num) AND -dzdx_num > 0 AND -dzdy_num < 0 THEN 7
          END AS aspect_sector
        FROM agg WHERE support = 9
        ORDER BY ix, iy
        """
    ).fetchall()
    assert len(got) == len(want) == (W - 2) * (H - 2)
    for g, w in zip(got, want):
        assert (g.ix, g.iy, g.v, g.dzdx_num, g.dzdy_num, g.aspect_sector) == tuple(w)


def test_trig_layer_matches_independent_normal_dot_light(spark, dem):
    """slope/aspect via Horn fractions; hillshade via unit-normal x
    unit-light-vector — a different derivation than the engine's fused
    cos(zenith/slope/azimuth-aspect) expression."""
    az_deg, alt_deg = 315.0, 45.0
    sa = {
        (r.ix, r.iy): r
        for r in terrain.slope_aspect(dem, CSX, CSY).collect()
    }
    hs = {
        (r.ix, r.iy): r.hillshade
        for r in terrain.hillshade(
            dem, CSX, CSY, azimuth_deg=az_deg, altitude_deg=alt_deg
        ).collect()
    }
    az, alt = math.radians(az_deg), math.radians(alt_deg)
    light = np.array(
        [math.sin(az) * math.cos(alt), math.cos(az) * math.cos(alt), math.sin(alt)]
    )
    for (ix, iy), r in sa.items():
        gx = r.dzdx_num / (8.0 * CSX)
        gy = r.dzdy_num / (8.0 * CSY)
        assert math.isclose(
            r.slope_rad, math.atan(math.hypot(gx, gy)), rel_tol=0, abs_tol=1e-12
        )
        if (gx, gy) != (0.0, 0.0):
            # compare directions, not raw angles: at gy == 0 the +/-pi
            # branch cut differs between engines' signed-zero handling
            diff = (r.aspect_rad - math.atan2(-gy, -gx)) % (2 * math.pi)
            assert min(diff, 2 * math.pi - diff) < 1e-12, (ix, iy)
            # sector must contain the aspect angle (45-deg bins; diagonal
            # ties land in the |ay|<=|ax| branch — either endpoint is ok)
            ang = math.degrees(r.aspect_rad) % 360.0
            lo = r.aspect_sector * 45.0
            assert lo - 1e-9 <= ang <= lo + 45.0 + 1e-9, (ix, iy, ang, lo)
        normal = np.array([-gx, -gy, 1.0])
        normal /= np.linalg.norm(normal)
        want = 255.0 * max(0.0, float(normal @ light))
        assert math.isclose(hs[(ix, iy)], want, rel_tol=0, abs_tol=1e-9), (ix, iy)


def test_linear_ramp_analytic(spark):
    p, q = 3, -5
    rows = [(ix, iy, p * ix + q * iy) for ix in range(8) for iy in range(8)]
    df = spark.createDataFrame(rows, "ix long, iy long, v long")
    out = terrain.horn_derivatives(df).collect()
    assert len(out) == 36
    for r in out:
        assert (r.dzdx_num, r.dzdy_num) == (8 * p, 8 * q)


def test_single_exchange_plan(spark, dem):
    df = terrain.slope_aspect(dem, CSX, CSY)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"(?<!Broadcast)Exchange", phys)) == 1, phys


def test_edge_and_hole_cells_suppressed(spark):
    pdf = _dem_pdf()
    holed = pdf[~((pdf.ix == 10) & (pdf.iy == 9))]
    df = spark.createDataFrame(holed)
    out = terrain.horn_derivatives(df)
    # the hole suppresses its own cell and all 8 neighbors
    assert out.count() == (W - 2) * (H - 2) - 9
    assert (
        out.where((F.abs(F.col("ix") - 10) <= 1) & (F.abs(F.col("iy") - 9) <= 1)).count()
        == 0
    )
