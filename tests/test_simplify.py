"""Douglas-Peucker simplification: independent recursive reference,
the DP deviation guarantee, ring/hole collapse policy, Spark wrapper.
"""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from demeter_spark.functions import geom as gm
from demeter_spark.functions import spark_udfs as su


def _seg_dist2(px, py, ax, ay, bx, by) -> float:
    """Squared point-to-segment distance, same arithmetic as the kernel."""
    dx, dy = bx - ax, by - ay
    s2 = dx * dx + dy * dy
    if s2 == 0.0:
        return (px - ax) ** 2 + (py - ay) ** 2
    t = min(1.0, max(0.0, ((px - ax) * dx + (py - ay) * dy) / s2))
    return (px - (ax + t * dx)) ** 2 + (py - (ay + t * dy)) ** 2


def _dp_recursive(xs, ys, eps):
    """Textbook recursive DP on an open polyline -> keep mask."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True

    def rec(i, j):
        if j - i < 2:
            return
        dmax, k = -1.0, -1
        for m in range(i + 1, j):
            d = _seg_dist2(xs[m], ys[m], xs[i], ys[i], xs[j], ys[j])
            if d > dmax:
                dmax, k = d, m
        if dmax > eps * eps:
            keep[k] = True
            rec(i, k)
            rec(k, j)

    rec(0, n - 1)
    return keep


@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=2,
        max_size=60,
    ),
    st.floats(0.001, 20.0),
)
@settings(max_examples=200, deadline=None)
def test_mask_matches_recursive_reference(pts, eps):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    got = gm._dp_keep_mask(xs, ys, eps)
    want = _dp_recursive(xs, ys, eps)
    assert (got == want).all()


@given(
    st.lists(
        st.tuples(
            st.floats(-100, 100, allow_nan=False),
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=3,
        max_size=50,
    ),
    st.floats(0.01, 10.0),
)
@settings(max_examples=200, deadline=None)
def test_ring_guarantee_every_vertex_within_eps(pts, eps):
    """The DP contract: every ORIGINAL vertex lies within eps of the
    simplified CLOSED ring (or the ring collapsed entirely), and the
    survivors are a subsequence of the original vertices."""
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    out = gm.simplify_ring(xs, ys, eps)
    if out is None:
        return
    sx, sy = out
    it = iter(zip(xs.tolist(), ys.tolist()))
    assert all(p in it for p in zip(sx.tolist(), sy.tolist()))
    m = len(sx)
    for px, py in zip(xs, ys):
        d2 = min(
            _seg_dist2(px, py, sx[i], sy[i], sx[(i + 1) % m], sy[(i + 1) % m])
            for i in range(m)
        )
        assert math.sqrt(d2) <= eps + 1e-9, (px, py, eps)


def test_eps_zero_keeps_everything():
    xs = np.array([0.0, 1.0, 2.0, 3.0])
    ys = np.array([0.0, 0.1, -0.1, 0.0])
    out = gm.simplify_ring(xs, ys, 0.0)
    assert out is not None and len(out[0]) == 4


def test_dense_square_collapses_to_corners():
    # dense square boundary: interior edge vertices are collinear -> only
    # the 4 corners survive any positive eps below the square size
    t = np.linspace(0.0, 1.0, 6)
    xs = np.concatenate([t, np.ones(5), t[::-1][1:], np.zeros(4)])
    ys = np.concatenate([np.zeros(6), t[1:], np.ones(5), t[::-1][1:-1]])
    out = gm.simplify_ring(xs, ys, 0.01)
    assert out is not None
    got = set(zip(out[0].tolist(), out[1].tolist()))
    assert got == {(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)}


def test_hole_collapse_drops_hole_outer_collapse_drops_part():
    outer = "(-10 -10, 10 -10, 10 10, -10 10)"
    sliver = "(0 0, 1 0.001, 2 0, 1 -0.001)"  # collapses at eps=0.1
    parts = gm.parse_wkt_polygons(f"POLYGON ({outer}, {sliver})")
    simp = gm.simplify_parts(parts, 0.1)
    assert len(simp) == 1 and len(simp[0]) == 1  # hole gone
    assert gm.simplify_parts(gm.parse_wkt_polygons(f"POLYGON ({sliver})"), 0.1) == []


def test_spark_wrapper_roundtrip(spark):
    dense_square = (
        "POLYGON ((0 0, 2 0.0005, 4 0, 6 -0.0005, 8 0, 8 4, 8 8, 4 8.0005, "
        "0 8, 0 4))"
    )
    df = spark.createDataFrame(
        [(1, dense_square), (2, None)], "pid int, geom_wkt string"
    ).select("pid", su.simplify_wkt(F.col("geom_wkt"), 0.01).alias("simp"))
    rows = {r.pid: r.simp for r in df.collect()}
    assert rows[2] is None
    parts = gm.parse_wkt_polygons(rows[1])
    assert len(parts) == 1 and len(parts[0]) == 1
    assert len(parts[0][0][0]) == 4  # the four corners
    # area preserved within the eps band around the 8x8 square
    assert abs(gm.parts_area(parts) - 64.0) < 0.2
