"""A1 dissolve area invariant (mirrors /root/reference/tests/vector/usda/
test_ssurgo.py:19-23) and the convex miter buffer (tiles.py:70-75 swath
dilation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeter_spark.functions import geom
from demeter_spark.operators import joins
from demeter_spark.operators.dissolve import dissolve
from demeter_spark.sources import synth


def test_dissolve_area_invariant(spark):
    """Union per kind preserves total area: closed-form truth per parcel
    (rect w*h, diamond 2ab, holed outer-hole) vs shoelace accounting."""
    par = synth.parcels(spark)
    out = {r["kind"]: r for r in dissolve(par, key="kind").collect()}
    assert out["rect"]["n_parts"] == 64
    assert out["rect"]["area"] == pytest.approx(64 * 3.5 * 3.25, rel=1e-12)
    assert out["diamond"]["area"] == pytest.approx(16 * 2 * 1.5 * 2.25, rel=1e-12)
    hol = out["holed"]
    assert hol["area"] == pytest.approx(
        (20.7505 - 10.2505) * (18.5005 - 10.2505)
        - (16.7505 - 13.2505) * (15.5005 - 12.2505),
        rel=1e-12,
    )
    # the emitted MULTIPOLYGON re-parses to the same parts and area
    for kind, row in out.items():
        parts = geom.parse_wkt_polygons(row["geom_wkt"])
        assert len(parts) == row["n_parts"]
        assert geom.parts_area(parts) == pytest.approx(row["area"], rel=1e-12)


def test_dissolve_overlap_guard(spark):
    df = spark.createDataFrame(
        [(1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
         (1, "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")],
        "parcel_id BIGINT, geom_wkt STRING",
    )
    with pytest.raises(Exception, match="overlap"):
        dissolve(df, check_overlap=True).collect()


def test_buffer_square():
    xs = np.array([0.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0])
    bx, by = geom.buffer_convex(xs, ys, 0.5)
    assert geom.polygon_area(bx, by) == pytest.approx(4.0)
    assert bx.min() == pytest.approx(-0.5) and bx.max() == pytest.approx(1.5)
    # clockwise input gives the same outward buffer
    bx2, by2 = geom.buffer_convex(xs[::-1].copy(), ys[::-1].copy(), 0.5)
    assert geom.polygon_area(bx2, by2) == pytest.approx(4.0)


def test_buffer_contains_true_round_buffer_points():
    """Miter buffer is a conservative superset of the round buffer: every
    point within `dist` of the ring is inside the miter buffer."""
    rng = np.random.default_rng(3)
    xs = np.array([0.0, 4.0, 5.0, 2.0, -1.0])
    ys = np.array([0.0, -1.0, 2.0, 4.0, 2.0])  # convex-ish CCW pentagon
    bx, by = geom.buffer_convex(xs, ys, 0.7)
    # sample points ON the original boundary, then push them outward < dist
    t = rng.uniform(0, 1, 300)
    e = rng.integers(0, len(xs), 300)
    x1, y1 = np.roll(xs, -1), np.roll(ys, -1)
    px = xs[e] + t * (x1[e] - xs[e])
    py = ys[e] + t * (y1[e] - ys[e])
    ang = rng.uniform(0, 2 * np.pi, 300)
    r = rng.uniform(0, 0.69, 300)
    qx, qy = px + r * np.cos(ang), py + r * np.sin(ang)
    inside = geom.points_in_ring(qx, qy, bx, by)
    assert inside.all()


def test_buffered_swath_cover_join(spark):
    """J8 parity: a thin orbit swath buffered before the cover join catches
    points within `dist` of the swath that the raw swath misses."""
    dist = 0.5
    xs = np.array([2.0, 10.0, 10.0, 2.0])
    ys = np.array([2.0, 2.0, 3.0, 3.0])  # thin horizontal swath
    bx, by = geom.buffer_convex(xs, ys, dist)
    swaths = spark.createDataFrame(
        [(1, geom.ring_to_wkt(bx, by))], "parcel_id BIGINT, geom_wkt STRING"
    )
    pts = spark.range(2000).selectExpr(
        "concat('p', CAST(id AS STRING)) AS url",
        "((id * 7) % 1200) / 100e0 + 0.005e0 AS lon",
        "((id * 13) % 600) / 100e0 + 0.005e0 AS lat",
    )
    got = {
        r["url"]
        for r in joins.spatial_join(pts, swaths, res=8).select("url").collect()
    }
    # truth: inside the miter-buffered rectangle = expanded bounds
    want = {
        r["url"]
        for r in pts.filter(
            (F.col("lon") > 2.0 - dist) & (F.col("lon") < 10.0 + dist)
            & (F.col("lat") > 2.0 - dist) & (F.col("lat") < 3.0 + dist)
        ).collect()
    }
    assert got == want and len(want) > 0


def test_buffer_handles_collinear_and_duplicate_vertices():
    """Densified inputs (redundant collinear vertices / repeated points) must
    not produce NaN miter intersections."""
    xs = np.array([0.0, 1.0, 2.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 0.0, 1.0, 2.0, 2.0])
    bx, by = geom.buffer_convex(xs, ys, 0.5)
    assert np.isfinite(bx).all() and np.isfinite(by).all()
    assert geom.polygon_area(bx, by) == pytest.approx(3.0 * 3.0)
    with pytest.raises(ValueError, match="degenerate"):
        geom.buffer_convex(np.array([0.0, 1.0, 2.0]), np.array([0.0, 0.0, 0.0]), 0.5)


def test_buffer_rejects_concave_ring():
    """ADVICE r02: a reflex vertex would make the miter offset self-
    intersect, silently breaking conservative containment — raise instead."""
    # L-shape: concave at (1, 1)
    xs = np.array([0.0, 2.0, 2.0, 1.0, 1.0, 0.0])
    ys = np.array([0.0, 0.0, 1.0, 1.0, 2.0, 2.0])
    with pytest.raises(ValueError, match="convex"):
        geom.buffer_convex(xs, ys, 0.3)
    # same ring given clockwise (normalization path) must also be caught
    with pytest.raises(ValueError, match="convex"):
        geom.buffer_convex(xs[::-1].copy(), ys[::-1].copy(), 0.3)
