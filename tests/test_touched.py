"""all_touched=True rasterization semantics (SURVEY.md §2.9 R1 variant).

The reference passes all_touched=True at every production mask call site
(demeter/raster/usgs/utils.py:50, polaris.py:274/290/314/355, slga.py:212/230,
sentinel2/ndvi.py:434); tests/raster/utils/test_mask.py:10-68 fixes the 4x4
two-polygon mask truth table this file reproduces. Engine semantics: a pixel
is touched iff the polygon interior overlaps the pixel's open box (positive-
area overlap) — GDAL's convention modulo measure-zero edge contact, which the
fixtures keep off the pixel lattice.
"""

import numpy as np
import pandas as pd
import pytest

from demeter_spark.functions import geom
from demeter_spark.operators import zonal
from demeter_spark.sources import synth


def _touched_set(wkt: str, rx=1.0, ry=1.0, ox=0.0, oy=0.0):
    parts = geom.parse_wkt_polygons(wkt)
    ix, iy = geom.touched_grid_boxes(parts, ox, oy, rx, ry)
    return set(zip(ix.tolist(), iy.tolist()))


def test_reference_4x4_two_polygon_truth_table():
    """The exact two polygons of the reference's mask test on a 4x4 identity
    grid (tests/raster/utils/test_mask.py:10-68): expected kept pixels
    [[0,0,0,0],[0,1,1,0],[0,1,1,1],[0,0,1,1]] (row = iy, col = ix)."""
    p1 = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
    p2 = "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"
    got = _touched_set(p1) | _touched_set(p2)
    expected_matrix = [
        [0, 0, 0, 0],
        [0, 1, 1, 0],
        [0, 1, 1, 1],
        [0, 0, 1, 1],
    ]
    expected = {
        (ix, iy)
        for iy, row in enumerate(expected_matrix)
        for ix, v in enumerate(row)
        if v
    }
    assert got == expected


def test_subpixel_polygon_touches_without_center_containment():
    """A polygon covering no pixel center still marks every pixel it
    overlaps — the defining difference from center (all_touched=False)
    semantics."""
    wkt = "POLYGON ((0.6 0.6, 1.4 0.6, 1.4 1.4, 0.6 1.4, 0.6 0.6))"
    assert _touched_set(wkt) == {(0, 0), (1, 0), (0, 1), (1, 1)}
    # center semantics: no pixel center in (0.6, 1.4)^2
    parts = geom.parse_wkt_polygons(wkt)
    centers_x = np.array([0.5, 1.5, 0.5, 1.5])
    centers_y = np.array([0.5, 0.5, 1.5, 1.5])
    inside = np.zeros(4, dtype=bool)
    for rings in parts:
        for xs, ys in rings:
            inside ^= geom.points_in_ring(centers_x, centers_y, xs, ys)
    assert not inside.any()


def test_touched_with_hole():
    """Pixels strictly inside a hole are NOT touched; pixels crossed by the
    hole boundary are."""
    wkt = (
        "POLYGON ((0.5 0.5, 5.5 0.5, 5.5 5.5, 0.5 5.5, 0.5 0.5), "
        "(1.5 1.5, 4.5 1.5, 4.5 4.5, 1.5 4.5, 1.5 1.5))"
    )
    got = _touched_set(wkt)
    # pixel (3,3) spans (3,4)^2, strictly inside the hole (1.5,4.5)^2
    assert (3, 3) not in got
    # (2,2) spans (2,3)^2: also strictly inside the hole
    assert (2, 2) not in got
    # (1,1) spans (1,2)^2: crossed by the hole boundary at 1.5 -> touched
    assert (1, 1) in got
    # (0,0) overlaps the outer ring region only -> touched
    assert (0, 0) in got
    # full row 0 touched (outer band)
    assert {(ix, 0) for ix in range(6)} <= got


def test_degenerate_edge_on_pixel_boundary_excluded():
    """Measure-zero contact: a polygon sharing only an edge with a pixel
    does not touch it (interior-overlap semantics)."""
    # polygon right edge exactly at x=2: pixel (2, 0) spanning (2,3) has
    # zero-area overlap -> untouched
    wkt = "POLYGON ((1.25 0.25, 2 0.25, 2 0.75, 1.25 0.75, 1.25 0.25))"
    got = _touched_set(wkt)
    assert (1, 0) in got
    assert (2, 0) not in got


def test_touched_superset_of_center_assignment(spark):
    """On the synthetic world, all_touched assignment is a strict superset
    of center-in-polygon assignment (edge pixels join in)."""
    cells = synth.raster_cells(spark).filter("dataset = 'elevation'")
    par = synth.parcels(spark)
    center = (
        zonal.cells_in_parcels(cells, par)
        .select("parcel_id", "ix", "iy")
        .toPandas()
    )
    touched = (
        zonal.touched_cells_in_parcels(
            cells, par, synth.CELL_DEG, synth.CELL_DEG
        )
        .select("parcel_id", "ix", "iy")
        .toPandas()
    )
    c_set = set(map(tuple, center.to_numpy().tolist()))
    t_set = set(map(tuple, touched.to_numpy().tolist()))
    assert c_set < t_set  # proper superset: edge pixels were being dropped


def test_touched_scales_through_shuffle_join(spark):
    """Scale path: thousands of parcels, broadcast disabled — the mask
    assignment runs as a shuffle join and still matches the closed-form
    rect-overlap truth computed independently in numpy."""
    par = (
        synth.many_parcels(spark, 18000)
        .filter("xmax < 36 AND ymax < 32")
        .persist()
    )
    cells = synth.raster_cells(spark).filter("dataset = 'elevation'")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = {
            (r["parcel_id"], r["ix"], r["iy"])
            for r in zonal.touched_cells_in_parcels(
                cells, par, synth.CELL_DEG, synth.CELL_DEG,
                broadcast_mask=False,
            ).select("parcel_id", "ix", "iy").collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
    # independent truth: open-interval overlap of each 0.25-degree box with
    # each open rect, vectorized in numpy
    P = par.select("parcel_id", "xmin", "ymin", "xmax", "ymax").collect()
    want = set()
    cd = synth.CELL_DEG
    for r in P:
        ix0 = int(np.floor(r["xmin"] / cd))
        ix1 = int(np.floor(r["xmax"] / cd))
        iy0 = int(np.floor(r["ymin"] / cd))
        iy1 = int(np.floor(r["ymax"] / cd))
        for ix in range(max(ix0, 0), min(ix1, synth.GRID_NX - 1) + 1):
            for iy in range(max(iy0, 0), min(iy1, synth.GRID_NY - 1) + 1):
                if (
                    (ix + 1) * cd > r["xmin"] and ix * cd < r["xmax"]
                    and (iy + 1) * cd > r["ymin"] and iy * cd < r["ymax"]
                ):
                    want.add((r["parcel_id"], ix, iy))
    par.unpersist()
    assert len(P) > 3000  # the dimension is genuinely non-tiny
    assert got == want


def test_zonal_stats_touched_matches_oracle(spark, ddb):
    """End-to-end pre-check of the driver's correctness gate row."""
    import __spark_entry__ as entry

    sdf = entry.queries()["zonal_stats_touched"](spark, None)
    s = (
        sdf.toPandas()
        .sort_values(["parcel_id", "dataset", "depth_lo"])
        .reset_index(drop=True)
    )
    d = (
        ddb.sql(entry.oracle_sql()["zonal_stats_touched"])
        .df()
        .sort_values(["parcel_id", "dataset", "depth_lo"])
        .reset_index(drop=True)
    )
    assert len(s) == len(d)
    assert list(s.columns) == list(d.columns)
    for c in s.columns:
        a, b = s[c].to_numpy(), d[c].to_numpy()
        if s[c].dtype.kind == "f":
            mask = ~(pd.isna(a) & pd.isna(b))
            assert (a[mask] == b[mask]).all(), c
        else:
            assert (a == b).all(), c
