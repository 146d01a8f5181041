"""Hex grid (H3-style) — kernel properties + three-engine bit parity.

The hex index complements the quad cellgrid (BASELINE.json north_star:
"H3 compact cell covers and S2 coverings"); these tests pin the axial
math, the k-ring combinatorics, the polyfill superset contract, and the
numpy == Catalyst == DuckDB bit-identity the oracle fold relies on.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from demeter_spark.functions import geom, hexgrid as hx, spark_udfs as su


def _rand(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(-179.9, 179.9, n), rng.uniform(-89.9, 89.9, n)


# ---------------------------------------------------------------- kernels


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(-(1 << 20), 1 << 20, 5000)
    r = rng.integers(-(1 << 20), 1 << 20, 5000)
    for res in (0, 5, 9, 15, 23):
        ids = hx.encode(q, r, res)
        dq, dr, dres = hx.decode(ids)
        assert np.array_equal(dq, q)
        assert np.array_equal(dr, r)
        assert np.all(dres == res)
        assert np.all(ids > 0)  # positive ids: safe through SQL BIGINT


def test_center_roundtrip_exact():
    lon, lat = _rand(20000, seed=2)
    for res in (3, 7, 11):
        ids = hx.hex_of(lon, lat, res)
        clon, clat = hx.hex_center(ids)
        assert np.array_equal(hx.hex_of(clon, clat, res), ids)


def test_containment_nearest_center():
    """Cube rounding assigns each point to the NEAREST hex center (the
    defining property of a hexagonal Voronoi partition): no k-ring-1
    neighbor's center is strictly closer than the assigned one."""
    lon, lat = _rand(3000, seed=3)
    res = 6
    ids = hx.hex_of(lon, lat, res)
    clon, clat = hx.hex_center(ids)
    # planar distance in the axial metric space (y scaled like the grid)
    d_own = np.hypot(lon - clon, lat - clat)
    nb = hx.neighbors(ids)
    nlon, nlat = hx.hex_center(nb.ravel())
    d_nb = np.hypot(
        np.repeat(lon, 6) - nlon, np.repeat(lat, 6) - nlat
    ).reshape(-1, 6)
    assert np.all(d_own <= d_nb.min(axis=1) + 1e-9)


def test_kring_sizes_distance_and_uniqueness():
    lon, lat = _rand(200, seed=4)
    ids = hx.hex_of(lon, lat, 8)
    for k in (1, 2, 3, 5):
        kr = hx.kring(ids, k)
        assert kr.shape == (200, 3 * k * (k + 1) + 1)
        # all distinct per row
        assert all(len(np.unique(row)) == kr.shape[1] for row in kr[:20])
        d = hx.hex_distance(np.repeat(ids, kr.shape[1]), kr.ravel())
        assert d.max() == k
        # disk = union of rings: exact-ring cells at every j <= k present
        rg = hx.ring(ids, k)
        assert rg.shape == (200, 6 * k)
        dr = hx.hex_distance(np.repeat(ids, 6 * k), rg.ravel())
        assert np.all(dr == k)
        assert np.all(np.isin(rg[:20], kr[:20]).all(axis=1))


def test_neighbors_symmetric_and_adjacent():
    lon, lat = _rand(100, seed=5)
    ids = hx.hex_of(lon, lat, 7)
    nb = hx.neighbors(ids)
    # symmetry: a in neighbors(b) for each b in neighbors(a)
    for i in range(20):
        for b in nb[i]:
            assert ids[i] in hx.neighbors(np.array([b]))[0]
    # centers of neighbors are all at the SAME distance (the hex-grid
    # property the quad grid lacks: uniform neighbor spacing)
    clon, clat = hx.hex_center(ids)
    nlon, nlat = hx.hex_center(nb.ravel())
    d = np.hypot(np.repeat(clon, 6) - nlon, np.repeat(clat, 6) - nlat)
    assert d.std() / d.mean() < 1e-9


def test_hex_distance_metric():
    lon, lat = _rand(300, seed=6)
    a = hx.hex_of(lon, lat, 6)
    b = np.roll(a, 1)
    c = np.roll(a, 7)
    dab = hx.hex_distance(a, b)
    assert np.array_equal(dab, hx.hex_distance(b, a))
    assert np.all(hx.hex_distance(a, a) == 0)
    assert np.all(
        hx.hex_distance(a, c) <= dab + hx.hex_distance(b, c)
    )


def test_corners_contain_point_samples():
    """Each hex's 6 corners describe the cell polygon; points assigned to
    the hex fall inside it (ray-cast PIP over the corner ring)."""
    lon, lat = _rand(500, seed=7)
    res = 5
    ids = hx.hex_of(lon, lat, res)
    cx, cy = hx.hex_corners(ids)
    inside = np.array(
        [
            geom.points_in_ring(
                np.array([lon[i]]), np.array([lat[i]]), cx[i], cy[i]
            )[0]
            for i in range(0, 500, 7)
        ]
    )
    assert inside.all()


def test_polyfill_hex_superset_and_classify():
    # a wiggly polygon; dense point samples inside must land in covered hexes
    t = np.linspace(0, 2 * np.pi, 60, endpoint=False)
    xs = 10.0 + (3.0 + np.cos(5 * t)) * np.cos(t)
    ys = 20.0 + (3.0 + np.cos(5 * t)) * np.sin(t)
    res = 6
    cells, full = hx.polyfill_hex(xs, ys, res, classify=True)
    assert len(cells) > 10
    assert np.all(np.isin(cells[np.argsort(cells)], cells))
    # superset: sampled interior points covered
    rng = np.random.default_rng(8)
    px = rng.uniform(xs.min(), xs.max(), 4000)
    py = rng.uniform(ys.min(), ys.max(), 4000)
    inside = geom.points_in_ring(px, py, xs, ys)
    got = hx.hex_of(px[inside], py[inside], res)
    assert np.isin(got, cells).all()
    # 'full' cells: every corner strictly inside the polygon
    fcells = cells[full]
    if len(fcells):
        cx, cy = hx.hex_corners(fcells)
        corner_in = geom.points_in_ring(
            cx.ravel(), cy.ravel(), xs, ys
        ).reshape(cx.shape)
        assert corner_in.all()


def test_polyfill_hex_with_hole():
    sq = np.array([0.0, 8.0, 8.0, 0.0]), np.array([0.0, 0.0, 8.0, 8.0])
    hole = np.array([3.0, 5.0, 5.0, 3.0]), np.array([3.0, 3.0, 5.0, 5.0])
    res = 7
    cells, full = hx.polyfill_hex_part([sq, hole], res, classify=True)
    # hexes whose centers are well inside the hole are not 'full' and the
    # deep-hole center hex is not covered at all
    hole_center = hx.hex_of(np.array([4.0]), np.array([4.0]), res)
    assert hole_center[0] not in cells[full]


# ----------------------------------------------------- three-engine parity


@settings(max_examples=40, deadline=None)
@given(
    st.floats(-180.0, 180.0, allow_nan=False),
    st.floats(-90.0, 90.0, allow_nan=False),
    st.integers(0, 12),
)
def test_numpy_duckdb_bit_parity(lon, lat, res):
    ids_np = hx.hex_of(np.array([lon]), np.array([lat]), res)
    sql = hx.hex_of_sql(repr(lon), repr(lat), res)
    got = duckdb.sql(f"SELECT {sql} AS h").fetchone()[0]
    assert got == ids_np[0]


def test_catalyst_matches_numpy(spark):
    lon, lat = _rand(50000, seed=9)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for res in (4, 9):
        got = (
            df.select(su.hex_of(F.col("lon"), F.col("lat"), res).alias("h"))
            .toPandas()["h"]
            .to_numpy()
            .astype(np.int64)
        )
        assert np.array_equal(got, hx.hex_of(lon, lat, res))
        # and the pandas-UDF variant
        got2 = (
            df.select(
                su.hex_of_pandas(F.col("lon"), F.col("lat"), res).alias("h")
            )
            .toPandas()["h"]
            .to_numpy()
            .astype(np.int64)
        )
        assert np.array_equal(got2, hx.hex_of(lon, lat, res))


def test_catalyst_hex_of_is_codegen(spark):
    """The hot-path hex assignment must stay inside whole-stage codegen:
    no Python, no BatchEvalPython in the plan."""
    df = spark.range(100).selectExpr(
        "CAST(id AS DOUBLE) / 10.0 AS lon", "CAST(id AS DOUBLE) / 20.0 AS lat"
    )
    out = df.select(su.hex_of(F.col("lon"), F.col("lat"), 8).alias("h"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_hex_kring_of_explodes_for_knn(spark):
    lon, lat = _rand(40, seed=10)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf).withColumn(
        "h", su.hex_of(F.col("lon"), F.col("lat"), 7)
    )
    k = 2
    ex = df.select(
        "h", F.explode(su.hex_kring_of(F.col("h"), k)).alias("nb")
    )
    pdf2 = ex.toPandas()
    assert len(pdf2) == 40 * (3 * k * (k + 1) + 1)
    d = hx.hex_distance(
        pdf2["h"].to_numpy().astype(np.int64),
        pdf2["nb"].to_numpy().astype(np.int64),
    )
    assert d.max() == k


# ------------------------------------------- hex cover-join consistency


def test_hex_cover_join_parity_with_quad_spatial_join(spark):
    """A hex cover join (polyfill_hex cover + hex_of point assignment +
    exact PIP refine) reproduces the quad-grid flagship join's (url,
    parcel_id) pairs exactly — the two indexes are interchangeable
    filter stages over the same refine."""
    import pandas as pd
    from pyspark.sql import functions as F

    from demeter_spark.functions import geom
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from tests.conftest import SF_DIR

    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    want = {
        (r["url"], r["parcel_id"])
        for r in joins.spatial_join(pts, par, res=8)
        .select("url", "parcel_id")
        .collect()
    }

    res = 5
    # driver-side cover build mirrors the engine's dimension-side cover
    # (the parcel table is a dimension; this is the broadcast path)
    rows = []
    for r in par.select("parcel_id", "geom_wkt").collect():
        parts = geom.parse_wkt_polygons(r["geom_wkt"])
        for part in parts:
            xs, ys = part[0]
            cells, full = hx.polyfill_hex(xs, ys, res, classify=True)
            for c, f in zip(cells, full):
                rows.append((r["parcel_id"], int(c), bool(f)))
    cover = spark.createDataFrame(
        pd.DataFrame(rows, columns=["parcel_id", "hex_id", "full"])
    )
    cand = (
        pts.withColumn("hex_id", su.hex_of(F.col("lon"), F.col("lat"), res))
        .join(F.broadcast(cover), "hex_id")
    )
    # refine: exact PIP for boundary hexes, skip for provably-full hexes
    wkt = {r["parcel_id"]: r["geom_wkt"] for r in par.collect()}
    got = set()
    for r in cand.collect():
        if r["full"]:
            got.add((r["url"], r["parcel_id"]))
            continue
        parts = geom.parse_wkt_polygons(wkt[r["parcel_id"]])
        inside = False
        for part in parts:
            hit = False
            for ring_i, (xs, ys) in enumerate(part):
                if geom.points_in_ring(
                    np.array([r["lon"]]), np.array([r["lat"]]), xs, ys
                )[0]:
                    hit = not hit if ring_i else True
                elif ring_i == 0:
                    break
            inside = inside or hit
        if inside:
            got.add((r["url"], r["parcel_id"]))
    assert got == want


def test_hex_kring_knn_candidate_completeness(spark):
    """kNN via hex k-ring expansion: for every query point, the true
    nearest neighbor's hex lies within the k-ring whose radius covers the
    current best distance — the ring-expansion invariant the quad kNN
    relies on, at uniform neighbor spacing."""
    rng = np.random.default_rng(77)
    qx, qy = rng.uniform(0, 10, 50), rng.uniform(0, 10, 50)
    px, py = rng.uniform(0, 10, 2000), rng.uniform(0, 10, 2000)
    res = 6
    s = hx.hex_size(res)
    q_hex = hx.hex_of(qx, qy, res)
    p_hex = hx.hex_of(px, py, res)
    # true NN
    d2 = (qx[:, None] - px[None, :]) ** 2 + (qy[:, None] - py[None, :]) ** 2
    nn = d2.argmin(axis=1)
    for i in range(50):
        true_d = np.sqrt(d2[i, nn[i]])
        # a k-ring of radius k covers every point within k * inradius*2
        # (adjacent hex centers are sqrt(3)*s apart; the guarantee is
        # conservative: k = ceil(d / (sqrt(3)*s)) + 1)
        k = int(np.ceil(true_d / (np.sqrt(3.0) * s))) + 1
        ring_ids = hx.kring(q_hex[i : i + 1], k)[0]
        assert p_hex[nn[i]] in ring_ids
