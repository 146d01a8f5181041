"""Terrain derivatives over cell grids: Horn slope / aspect / hillshade.

Capability extension of the reference's elevation stack: demeter fetches
USGS 1/3-arc-second DEMs and runs zonal statistics over raw elevation
(demeter/raster/usgs/topography.py:30-78, demeter/raster/__init__.py) —
the first thing an elevation consumer derives downstream is slope/aspect/
hillshade (the classic Horn 1981 3x3 finite-difference method, the public
algorithm gdaldem implements). This module computes them as ONE relational
pass so they compose with the existing zonal/merge/pyramid operators.

Spark shape (scale posture at continental DEM scale):

- every cell EXPLODES into its 9 stencil contributions (map-side, x9 rows
  before the combiner) tagged with integer Horn weights
  ``wx = ox*(2-|oy|)``, ``wy = oy*(2-|ox|)``;
- ONE groupBy(ix, iy) sums the weighted contributions — partial
  aggregation combines map-side, so the single Exchange carries per-cell
  partials (plan-asserted: exactly one non-broadcast Exchange);
- only interior cells (all 9 contributions present) emit — edge cells
  have undefined Horn derivatives and are dropped rather than padded,
  matching gdaldem's default edge behavior of not inventing data.

Exactness: for integer DEMs the weighted sums ``dzdx_num``/``dzdy_num``
(units: elevation, pre-division by 8*cell_size) are exact BIGINTs and the
8-way ``aspect_sector`` derives from sign/magnitude comparisons only —
both cross-engine oracle-checkable. slope/aspect/hillshade radians are
float trig on top (pinned against an independent numpy Horn
implementation in tests, not a SQL oracle — trig is not cross-engine
bit-stable, the documented gauss/exp finding).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["horn_derivatives", "slope_aspect", "hillshade"]


def horn_derivatives(
    cells: DataFrame,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Exact Horn stencil numerators per interior cell.

    Input: one row per grid cell (ix, iy, v); output (ix, iy, v,
    dzdx_num, dzdy_num) where dz/dx = dzdx_num / (8 * cell_size_x) with x
    increasing eastward and y increasing northward. Missing neighbors
    (grid edges, nodata holes) suppress the cell entirely.
    """
    contrib = cells.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 8), o -> struct("
                "o div 3 - 1 AS ox, o % 3 - 1 AS oy))"
            )
        ).alias("_o"),
        F.col(ix_col).alias("_sx"),
        F.col(iy_col).alias("_sy"),
        F.col(value_col).alias("_v"),
    ).select(
        (F.col("_sx") - F.col("_o.ox")).alias("ix"),
        (F.col("_sy") - F.col("_o.oy")).alias("iy"),
        # weight of the SOURCE cell in the TARGET's window: the source
        # sits at offset (ox, oy) from the target it contributes to.
        (F.col("_v") * (F.col("_o.ox") * (F.lit(2) - F.abs("_o.oy")))).alias("_cx"),
        (F.col("_v") * (F.col("_o.oy") * (F.lit(2) - F.abs("_o.ox")))).alias("_cy"),
        F.when((F.col("_o.ox") == 0) & (F.col("_o.oy") == 0), F.col("_v")).alias(
            "_center"
        ),
        # NULL values (nodata holes) don't count as support, so a hole
        # suppresses its 3x3 neighborhood exactly like a missing row
        F.when(F.col("_v").isNotNull(), 1).alias("_n"),
    )
    return (
        contrib.groupBy("ix", "iy")
        .agg(
            F.sum("_cx").alias("dzdx_num"),
            F.sum("_cy").alias("dzdy_num"),
            F.max("_center").alias("v"),
            F.sum("_n").alias("_support"),
        )
        .where(F.col("_support") == 9)
        .select("ix", "iy", "v", "dzdx_num", "dzdy_num")
    )


def slope_aspect(
    cells: DataFrame,
    cell_size_x: float,
    cell_size_y: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Slope/aspect per interior cell, plus the exact 8-way aspect sector.

    - ``slope_rad`` = atan(hypot(dz/dx, dz/dy)) (Horn; gdaldem's default)
    - ``aspect_rad`` = atan2(-dz/dy, -dz/dx) in (-pi, pi]: the math angle
      of the DOWNSLOPE vector -grad(z) with x east / y north, so 0 =
      east-facing, pi/2 = north-facing, counterclockwise (compass
      conversion is a presentation concern; gdaldem's atan2(dzdy, -dzdx)
      is this same vector because its row axis points SOUTH)
    - ``aspect_sector`` = which of the 8 half-open 45-degree sectors of
      the downslope vector (-dzdx_num*csy, -dzdy_num*csx) the cell falls
      in, counted counterclockwise from the +x axis (ties on the 45-degree
      diagonals break toward the ``|ay| <= |ax|`` branch, i.e. sectors
      0/3/4/7); NULL for flat cells. With
      integer numerators and equal cell sizes this is pure integer
      sign/|.| comparison — exact in any engine.
    """
    d = horn_derivatives(cells, ix_col, iy_col, value_col)
    gx = F.col("dzdx_num") / F.lit(8.0 * cell_size_x)
    gy = F.col("dzdy_num") / F.lit(8.0 * cell_size_y)
    # sector test operates on the integer numerators scaled by the OTHER
    # axis's cell size so both components share units; for the common
    # square-cell case the scale factors cancel and stay integer-exact.
    ax = -F.col("dzdx_num") * F.lit(cell_size_y)
    ay = -F.col("dzdy_num") * F.lit(cell_size_x)
    octant = (
        F.when((F.abs(ay) <= F.abs(ax)) & (ax > 0) & (ay >= 0), 0)
        .when((F.abs(ay) > F.abs(ax)) & (ay > 0) & (ax > 0), 1)
        .when((F.abs(ay) > F.abs(ax)) & (ay > 0) & (ax <= 0), 2)
        .when((F.abs(ay) <= F.abs(ax)) & (ax < 0) & (ay > 0), 3)
        .when((F.abs(ay) <= F.abs(ax)) & (ax < 0) & (ay <= 0), 4)
        .when((F.abs(ay) > F.abs(ax)) & (ay < 0) & (ax < 0), 5)
        .when((F.abs(ay) > F.abs(ax)) & (ay < 0) & (ax >= 0), 6)
        .when((F.abs(ay) <= F.abs(ax)) & (ax > 0) & (ay < 0), 7)
    )
    return d.select(
        "ix",
        "iy",
        "v",
        "dzdx_num",
        "dzdy_num",
        F.atan(F.sqrt(gx * gx + gy * gy)).alias("slope_rad"),
        F.atan2(-gy, -gx).alias("aspect_rad"),
        octant.cast("int").alias("aspect_sector"),
    )


def hillshade(
    cells: DataFrame,
    cell_size_x: float,
    cell_size_y: float,
    azimuth_deg: float = 315.0,
    altitude_deg: float = 45.0,
    z_factor: float = 1.0,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Lambertian hillshade in [0, 255] (gdaldem-style illumination model).

    shade = 255 * max(0, cos(zenith)*cos(slope)
                         + sin(zenith)*sin(slope)*cos(azimuth' - aspect'))
    with the standard compass-to-math angle plumbing folded into the
    light-vector constants so the kernel is one fused expression per cell.
    """
    sa = slope_aspect(cells, cell_size_x, cell_size_y, ix_col, iy_col, value_col)
    zen = math.radians(90.0 - altitude_deg)
    # sun's horizontal direction (sin az, cos az) in east/north axes has
    # math angle 90 - az; aspect below is the downslope math angle, so the
    # cos(delta) term is a true angle-between-unit-vectors (equivalence
    # with the normal-dot-light form is derived in tests/test_terrain.py).
    az = math.radians(90.0 - azimuth_deg)
    gx = F.col("dzdx_num") * F.lit(z_factor / (8.0 * cell_size_x))
    gy = F.col("dzdy_num") * F.lit(z_factor / (8.0 * cell_size_y))
    slope = F.atan(F.sqrt(gx * gx + gy * gy))
    aspect = F.atan2(-gy, -gx)
    shade = F.lit(255.0) * F.greatest(
        F.lit(0.0),
        F.lit(math.cos(zen)) * F.cos(slope)
        + F.lit(math.sin(zen)) * F.sin(slope) * F.cos(F.lit(az) - aspect),
    )
    return sa.select("ix", "iy", "v", shade.alias("hillshade"))
