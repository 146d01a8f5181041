"""Vector tile cut: area-partition invariant, PIP consistency, full-tile
exactness, per-zoom simplification band.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeter_spark.functions import cellgrid as cg
from demeter_spark.functions import geom as gm
from demeter_spark.operators.tilecut import tile_cut

RES = 8  # ~1.4 x 0.7 degree tiles

# non-convex L-shape spanning several tiles
L_SHAPE = "POLYGON ((0 0, 9 0, 9 3.3, 4.1 3.3, 4.1 8.2, 0 8.2))"
# square with a hole big enough to swallow whole tiles
HOLED = "POLYGON ((20 20, 32 20, 32 32, 20 32), (22 22, 30 22, 30 30, 22 30))"
# multipolygon: two disjoint triangles
MULTI = (
    "MULTIPOLYGON (((-30 -10, -20 -10, -25 -2)), ((-30 5, -18 5, -24 12)))"
)
PARCELS = [(1, L_SHAPE), (2, HOLED), (3, MULTI)]


@pytest.fixture(scope="module")
def cut(spark):
    df = spark.createDataFrame(PARCELS, "parcel_id long, geom_wkt string")
    return tile_cut(df, RES).localCheckpoint()


def test_area_partition_invariant(cut):
    got = {
        r.parcel_id: r.total
        for r in cut.groupBy("parcel_id").agg(F.sum("area").alias("total")).collect()
    }
    for pid, wkt in PARCELS:
        want = gm.parts_area(gm.parse_wkt_polygons(wkt))
        assert math.isclose(got[pid], want, rel_tol=1e-9), (pid, got[pid], want)


def test_full_tiles_are_exact_cell_boxes(cut):
    rows = cut.where("full").collect()
    assert rows, "fixture must produce interior tiles"
    for r in rows:
        x0, y0, x1, y1 = (float(v[0]) for v in cg.cell_bounds(np.array([r.cell])))
        parts = gm.parse_wkt_polygons(r.geom_wkt)
        assert len(parts) == 1 and len(parts[0]) == 1
        xs, ys = parts[0][0]
        assert set(zip(xs.tolist(), ys.tolist())) == {
            (x0, y0), (x1, y0), (x1, y1), (x0, y1)
        }
        assert math.isclose(r.area, (x1 - x0) * (y1 - y0), rel_tol=1e-12)


def test_hole_interior_emits_no_tiles(cut):
    # tiles wholly inside the hole of parcel 2 must not appear
    hole_center = cg.cell_of(np.array([26.0]), np.array([26.0]), RES)[0]
    assert cut.where(
        (F.col("parcel_id") == 2) & (F.col("cell") == int(hole_center))
    ).count() == 0


def test_pip_consistency_against_uncut_polygons(cut):
    """Random points: point-in-parcel iff point-in-(clipped geometry of the
    point's own tile) — the property a tile-served PIP relies on."""
    rng = np.random.default_rng(7)
    tiles = {
        (r.parcel_id, r.cell): gm.parse_wkt_polygons(r.geom_wkt)
        for r in cut.collect()
    }
    for pid, wkt in PARCELS:
        parts = gm.parse_wkt_polygons(wkt)
        xs = rng.uniform(-35, 35, 4000)
        ys = rng.uniform(-15, 35, 4000)
        inside = gm.points_in_parts(xs, ys, parts)
        cells = cg.cell_of(xs, ys, RES)
        for x, y, c, want in zip(xs, ys, cells, inside):
            t = tiles.get((pid, int(c)))
            got = bool(t and gm.points_in_parts(np.array([x]), np.array([y]), t)[0])
            assert got == bool(want), (pid, x, y)


def test_simplified_cut_stays_in_eps_band(spark):
    # a dense, wiggly ring: simplification must shrink vertices while the
    # per-parcel area moves by at most perimeter * eps
    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    xs = 10 * np.cos(t) + 0.01 * np.cos(40 * t)
    ys = 10 * np.sin(t) + 0.01 * np.sin(40 * t)
    wkt = gm.multipolygon_wkt([[(xs, ys)]])
    df = spark.createDataFrame([(9, wkt)], "parcel_id long, geom_wkt string")
    frac = 0.05
    exact = tile_cut(df, RES, simplify_frac=0.0).localCheckpoint()
    simp = tile_cut(df, RES, simplify_frac=frac).localCheckpoint()
    # count vertices on BOUNDARY tiles only — full tiles are 4-corner
    # boxes either way and would dilute the reduction signal
    nv = F.sum(F.size(F.split("geom_wkt", ",")))
    n_exact = exact.where(~F.col("full")).agg(nv).collect()[0][0]
    n_simp = simp.where(~F.col("full")).agg(nv).collect()[0][0]
    # box-crossing vertices are load-bearing (deviation > eps), so the
    # reduction floor is set by crossings per tile, not by the arc density
    assert n_simp < 0.7 * n_exact, (n_simp, n_exact)
    a_exact = exact.agg(F.sum("area")).collect()[0][0]
    a_simp = simp.agg(F.sum("area")).collect()[0][0]
    lon_w, _ = cg.cell_size(RES)
    perimeter = 2 * np.pi * 10 * 1.2
    assert abs(a_simp - a_exact) < perimeter * frac * lon_w, (a_simp, a_exact)


def test_single_exchange_plan(spark):
    df = spark.createDataFrame(PARCELS, "parcel_id long, geom_wkt string")
    import re

    phys = tile_cut(df, RES)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"(?<!Broadcast)Exchange", phys)) == 1, phys
