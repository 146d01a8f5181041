"""Unit tests for the hierarchical cell index (numpy core, no Spark).

Shaped like the reference's operator unit tests on tiny hand-built inputs
(tests/raster/utils/test_merge.py, test_transform.py).
"""

import numpy as np

from demeter_spark.functions import cellgrid as cg


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    for res in (0, 1, 5, 12, 20, 26):
        n = 1 << res
        ix = rng.integers(0, n, 1000)
        iy = rng.integers(0, n, 1000)
        ids = cg.encode(ix, iy, res)
        rx, ry, rr = cg.decode(ids)
        assert (rx == ix).all() and (ry == iy).all() and (rr == res).all()
        assert (ids >= 0).all()  # fits signed int64


def test_cell_of_bounds_contain_point():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 5000)
    lat = rng.uniform(-90, 90, 5000)
    for res in (3, 9, 15):
        ids = cg.cell_of(lon, lat, res)
        x0, y0, x1, y1 = cg.cell_bounds(ids)
        assert (lon >= x0).all() and (lon < x1 + 1e-9).all()
        assert (lat >= y0).all() and (lat < y1 + 1e-9).all()


def test_parent_children_roundtrip():
    rng = np.random.default_rng(3)
    res = 10
    ids = cg.cell_of(rng.uniform(-180, 180, 200), rng.uniform(-90, 90, 200), res)
    ch = cg.children(ids)
    assert ch.shape == (200, 4)
    for k in range(4):
        assert (cg.parent(ch[:, k]) == ids).all()
    # parent of point cell at res-1 == cell_of at res-1
    lon, lat = cg.cell_center(ids)
    assert (cg.parent(ids) == cg.cell_of(lon, lat, res - 1)).all()


def test_ancestors_chain():
    ids = cg.cell_of(np.array([10.0]), np.array([45.0]), 12)
    anc = cg.ancestors(ids, 8)
    assert anc.shape == (1, 5)
    _, _, res = cg.decode(anc.ravel())
    assert list(res) == [12, 11, 10, 9, 8]
    assert anc[0, 1] == cg.parent(ids)[0]


def test_kring_contains_neighbors_and_self():
    ids = cg.cell_of(np.array([0.3]), np.array([0.3]), 8)
    ring1 = set(cg.kring(ids, 1)[0].tolist())
    assert len(ring1) == 9
    assert int(ids[0]) in ring1
    # every ring-1 member is within 1 cell step
    ix, iy, _ = cg.decode(ids)
    for nid in ring1:
        nx, ny, nr = cg.decode(np.array([nid]))
        assert nr[0] == 8
        assert abs(int(nx[0]) - int(ix[0])) <= 1 and abs(int(ny[0]) - int(iy[0])) <= 1


def test_kring_wraps_longitude_and_clamps_latitude():
    res = 4
    n = 1 << res
    west = cg.encode(np.array([0]), np.array([n // 2]), res)
    ring = cg.kring(west, 1)[0]
    ix, _, _ = cg.decode(ring)
    assert (ix == n - 1).sum() == 3  # wrapped across the antimeridian
    south = cg.encode(np.array([5]), np.array([0]), res)
    ring = cg.kring(south, 1)[0]
    _, iy, _ = cg.decode(ring)
    assert (iy >= 0).all()


def test_polyfill_is_conservative_cover():
    """Random points inside a concave polygon must land in polyfill cells."""
    # concave L-shape
    xs = np.array([0.0, 4.0, 4.0, 2.0, 2.0, 0.0])
    ys = np.array([0.0, 0.0, 2.0, 2.0, 4.0, 4.0])
    for res in (6, 8, 10):
        cover = set(cg.polyfill(xs, ys, res).tolist())
        assert cover
        rng = np.random.default_rng(res)
        px = rng.uniform(0, 4, 4000)
        py = rng.uniform(0, 4, 4000)
        inside = (px <= 2) | (py <= 2)  # exact L-shape membership
        cells = cg.cell_of(px[inside], py[inside], res)
        assert all(int(c) in cover for c in cells)


def test_polyfill_tiny_polygon_within_one_cell():
    xs = np.array([10.001, 10.002, 10.002, 10.001])
    ys = np.array([20.001, 20.001, 20.002, 20.002])
    cover = cg.polyfill(xs, ys, 6)
    assert len(cover) >= 1
    assert int(cg.cell_of(np.array([10.0015]), np.array([20.0015]), 6)[0]) in set(
        cover.tolist()
    )


def test_compact_collapses_full_quads():
    base = cg.cell_of(np.array([50.0]), np.array([10.0]), 8)
    quad = cg.children(base).ravel()  # 4 siblings at res 9
    out = cg.compact(quad)
    assert set(out.tolist()) == {int(base[0])}
    # partial quad stays put
    out2 = cg.compact(quad[:3])
    assert set(out2.tolist()) == set(quad[:3].tolist())


def test_compact_multilevel_and_coverage_preserved():
    base = cg.cell_of(np.array([50.0]), np.array([10.0]), 6)
    lvl1 = cg.children(base).ravel()
    lvl2 = cg.children(lvl1).reshape(-1)  # all 16 grandchildren
    out = cg.compact(lvl2)
    assert set(out.tolist()) == {int(base[0])}
    # mixed: 15 grandchildren (one quad incomplete) -> 3 children + 3 leaves
    out2 = cg.compact(lvl2[:-1])
    _, _, res = cg.decode(out2)
    assert sorted(res.tolist()) == [7, 7, 7, 8, 8, 8]


def test_jvm_cell_of_matches_numpy(spark=None):
    """The Catalyst bit-op cell_of must equal the numpy kernel everywhere."""
    import pytest
    pytest.importorskip("pyspark")
    from demeter_spark.session import get_spark
    from demeter_spark.functions.spark_udfs import cell_of, cell_of_pandas
    from pyspark.sql import functions as F

    s = get_spark(shuffle_partitions=8)
    pts = s.range(20000).selectExpr(
        "((id * 2654435761) % 360000) / 1000e0 - 180 AS lon",
        "((id * 40503) % 180000) / 1000e0 - 90 AS lat",
    )
    for res in (0, 5, 10, 20, 26):
        bad = pts.withColumn("a", cell_of(F.col("lon"), F.col("lat"), res)) \
                 .withColumn("b", cell_of_pandas(F.col("lon"), F.col("lat"), res)) \
                 .filter("a != b").count()
        assert bad == 0, f"res {res}: {bad} mismatches"
