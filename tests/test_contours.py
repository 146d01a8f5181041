"""Marching-squares contours vs an independent numpy reference with the
same case table / saddle rule / IEEE interpolation expressions, plus
topological checks on the linked polylines."""

import numpy as np
import pytest

from demeter_spark.operators import contours

NX, NY = 28, 20
LEVEL = 5.0

_CASE_SEGS = {
    1: [(0, 3)], 2: [(0, 1)], 3: [(1, 3)], 4: [(1, 2)], 6: [(0, 2)],
    7: [(2, 3)], 8: [(2, 3)], 9: [(0, 2)], 11: [(1, 2)], 12: [(1, 3)],
    13: [(0, 1)], 14: [(0, 3)],
}


def _two_bumps():
    # two disjoint smooth bumps above LEVEL -> two closed contour loops
    g = np.zeros((NY, NX))
    for y in range(NY):
        for x in range(NX):
            g[y, x] = 9.0 / (1 + 0.12 * ((x - 7) ** 2 + (y - 6) ** 2)) + 9.0 / (
                1 + 0.10 * ((x - 20) ** 2 + (y - 13) ** 2)
            )
    return np.round(g, 4)


def _saddle_grid():
    # hand-built saddles: both case 5 and case 10 blocks
    return np.array(
        [
            [9.0, 1.0, 9.0],
            [1.0, 9.0, 1.0],
            [9.0, 1.0, 9.0],
        ]
    )


def _ref_segments(g, level):
    ny, nx = g.shape
    segs = []
    for by in range(ny - 1):
        for bx in range(nx - 1):
            c0, c1 = g[by, bx], g[by, bx + 1]
            c2, c3 = g[by + 1, bx + 1], g[by + 1, bx]
            cse = (
                int(c0 >= level)
                + 2 * int(c1 >= level)
                + 4 * int(c2 >= level)
                + 8 * int(c3 >= level)
            )
            if cse in (0, 15):
                continue
            pts = {
                0: (bx + (level - c0) / (c1 - c0), float(by)),
                1: (float(bx + 1), by + (level - c1) / (c2 - c1)),
                2: (bx + (level - c3) / (c2 - c3), float(by + 1)),
                3: (float(bx), by + (level - c0) / (c3 - c0)),
            }
            if cse in (5, 10):
                center_in = (c0 + c1 + c2 + c3) / 4.0 >= level
                if cse == 5:
                    pairs = [(0, 1), (2, 3)] if center_in else [(0, 3), (1, 2)]
                else:
                    pairs = [(0, 3), (1, 2)] if center_in else [(0, 1), (2, 3)]
            else:
                pairs = _CASE_SEGS[cse]
            for a, b in pairs:
                segs.append((bx, by, pts[a], pts[b]))
    return segs


def _collect_segments(spark, g, level):
    rows = [
        (int(x), int(y), float(g[y, x]))
        for y in range(g.shape[0])
        for x in range(g.shape[1])
    ]
    df = spark.createDataFrame(rows, "ix int, iy int, v double")
    return contours.contour_segments(df, level), df


def test_segments_match_reference_bit_exact(spark):
    g = _two_bumps()
    seg_df, _ = _collect_segments(spark, g, LEVEL)
    got = sorted(
        (r["bx"], r["by"], (r["x1"], r["y1"]), (r["x2"], r["y2"]))
        for r in seg_df.collect()
    )
    want = sorted(_ref_segments(g, LEVEL))
    assert got == want  # exact float equality, same IEEE expressions


def test_saddle_cases_match_reference(spark):
    g = _saddle_grid()
    for level in (4.0, 6.0):  # flips center_in across the two saddles
        seg_df, _ = _collect_segments(spark, g, level)
        got = sorted(
            (r["bx"], r["by"], (r["x1"], r["y1"]), (r["x2"], r["y2"]))
            for r in seg_df.collect()
        )
        want = sorted(_ref_segments(g, level))
        assert got == want, level


def test_linked_lines_two_loops(spark):
    g = _two_bumps()
    seg_df, _ = _collect_segments(spark, g, LEVEL)
    lines = contours.contour_lines(seg_df).collect()
    by_line = {}
    for r in lines:
        by_line.setdefault(r["line_id"], []).append(r)
    assert len(by_line) == 2  # one closed loop per bump
    for segs in by_line.values():
        # closed loop: every lattice-edge key appears exactly twice
        keys = [r["key1"] for r in segs] + [r["key2"] for r in segs]
        from collections import Counter

        assert all(n == 2 for n in Counter(keys).values())
        assert len(segs) >= 4


def test_endpoints_lie_on_block_border(spark):
    g = _two_bumps()
    seg_df, _ = _collect_segments(spark, g, LEVEL)
    for r in seg_df.collect():
        for x, y in ((r["x1"], r["y1"]), (r["x2"], r["y2"])):
            on_v = x in (r["bx"], r["bx"] + 1) and r["by"] <= y <= r["by"] + 1
            on_h = y in (r["by"], r["by"] + 1) and r["bx"] <= x <= r["bx"] + 1
            assert on_v or on_h, (r["bx"], r["by"], x, y)
