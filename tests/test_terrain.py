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


def test_null_value_suppresses_neighborhood(spark):
    pdf = _dem_pdf()
    pdf.loc[(pdf.ix == 10) & (pdf.iy == 9), "v"] = None
    df = spark.createDataFrame(pdf)
    out = terrain.horn_derivatives(df)
    assert out.count() == (W - 2) * (H - 2) - 9
    assert (
        out.where((F.abs(F.col("ix") - 10) <= 1) & (F.abs(F.col("iy") - 9) <= 1)).count()
        == 0
    )


def test_zonal_slope_composition(spark):
    """terrain -> zonal composition: mean squared-gradient-numerator per
    parcel over the synthetic elevation grid, verified against a driver-side
    numpy Horn + center-PIP recomputation (independent of every Spark op in
    the chain)."""
    from demeter_spark.operators import zonal
    from demeter_spark.functions import geom as gmod
    from demeter_spark.sources import synth

    cells = synth.raster_cells(spark).filter("dataset = 'elevation'")
    d = terrain.horn_derivatives(cells, value_col="value")
    slope_cells = (
        d.join(cells.select("ix", "iy", "cx", "cy"), ["ix", "iy"])
        .selectExpr(
            "'slope' AS dataset",
            "0 AS depth_lo",
            "cx",
            "cy",
            "dzdx_num * dzdx_num + dzdy_num * dzdy_num AS value",
        )
    )
    par = synth.parcels(spark)
    got = {
        r.parcel_id: (r.n_valid, r.sum_value)
        for r in zonal.zonal_stats(slope_cells, par).collect()
    }

    # independent recomputation
    pdf = cells.select("ix", "iy", "cx", "cy", "value").toPandas()
    w = int(pdf.ix.max()) + 1
    h = int(pdf.iy.max()) + 1
    grid = np.full((w, h), np.nan)
    grid[pdf.ix.to_numpy(), pdf.iy.to_numpy()] = pdf.value.to_numpy()
    want: dict[int, list] = {}
    parcels = {
        r.parcel_id: gmod.parse_wkt_polygons(r.geom_wkt)
        for r in par.collect()
    }
    cxs = dict(zip(pdf.ix, pdf.cx))
    cys = dict(zip(pdf.iy, pdf.cy))
    for ix in range(1, w - 1):
        for iy in range(1, h - 1):
            win = grid[ix - 1 : ix + 2, iy - 1 : iy + 2]
            if np.isnan(win).any():
                continue
            dzdx = (
                (win[2, 0] + 2 * win[2, 1] + win[2, 2])
                - (win[0, 0] + 2 * win[0, 1] + win[0, 2])
            )
            dzdy = (
                (win[0, 2] + 2 * win[1, 2] + win[2, 2])
                - (win[0, 0] + 2 * win[1, 0] + win[2, 0])
            )
            s2 = dzdx * dzdx + dzdy * dzdy
            px, py = np.array([cxs[ix]]), np.array([cys[iy]])
            for pid, parts in parcels.items():
                if gmod.points_in_parts(px, py, parts)[0]:
                    want.setdefault(pid, [0, 0.0])
                    want[pid][0] += 1
                    want[pid][1] += s2
    assert set(got) == set(want)
    for pid in want:
        assert got[pid][0] == want[pid][0], pid
        assert math.isclose(got[pid][1], want[pid][1], rel_tol=1e-12), pid
