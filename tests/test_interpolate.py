"""IDW gridding vs a sequential Python reference with the identical
(rank, site_id) fold order — bit-exact for the product-form weights
(sqrt and 1/(d*d) are correctly-rounded IEEE ops in both engines)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import interpolate

LON0, LAT0, NX, NY, CELL = 10.0, 40.0, 12, 8, 0.05


def _sites(n=60, seed=7):
    rng = random.Random(seed)
    return [
        (
            i,
            LON0 + rng.random() * NX * CELL,
            LAT0 + rng.random() * NY * CELL,
            round(rng.random() * 100, 3),
        )
        for i in range(n)
    ]


def _ref_idw(nodes, sites, k, power):
    out = {}
    for nid, lon, lat in nodes:
        cand = []
        for sid, slon, slat, v in sites:
            dx, dy = lon - slon, lat - slat
            cand.append((math.sqrt(dx * dx + dy * dy), sid, v))
        cand.sort()
        top = cand[:k]
        exact = [c for c in top if c[0] == 0.0]
        if exact:
            out[nid] = exact[0][2]
            continue
        if len(top) == 1:  # Voronoi rule: exact site value, no blend
            out[nid] = top[0][2]
            continue
        num = den = 0.0
        for d, _, v in top:  # same (dist, sid) order as the Spark fold
            w = (
                1.0
                if power == 0
                else 1.0 / (d * d)
                if power == 2
                else 1.0 / ((d * d) * (d * d))
                if power == 4
                else 1.0 / d**power
            )
            num += v * w
            den += w
        out[nid] = num / den
    return out


@pytest.fixture(scope="module")
def sites_df(spark):
    return spark.createDataFrame(
        _sites(), "site_id bigint, lon double, lat double, value double"
    )


def _node_list():
    return [
        (iy * NX + ix, LON0 + (ix + 0.5) * CELL, LAT0 + (iy + 0.5) * CELL)
        for iy in range(NY)
        for ix in range(NX)
    ]


@pytest.mark.parametrize("power", [0, 2, 4])
def test_idw_matches_reference_bit_exact(spark, sites_df, power):
    got = {
        r["node_id"]: r["value"]
        for r in interpolate.idw_grid(
            spark, sites_df, LON0, LAT0, NX, NY, CELL, k=6, power=power, res=9
        ).collect()
    }
    want = _ref_idw(_node_list(), _sites(), k=6, power=power)
    assert set(got) == set(want)
    assert all(got[n] == want[n] for n in want), max(
        abs(got[n] - want[n]) for n in want
    )


def test_exact_hit_takes_site_value(spark):
    # a site exactly on a node center: that node returns the site value
    node_lon, node_lat = LON0 + 0.5 * CELL, LAT0 + 0.5 * CELL
    sites = spark.createDataFrame(
        [
            (1, node_lon, node_lat, 42.5),
            (2, node_lon + 0.2, node_lat + 0.1, 7.0),
            (3, node_lon - 0.1, node_lat + 0.2, 9.0),
        ],
        "site_id bigint, lon double, lat double, value double",
    )
    out = {
        r["node_id"]: r
        for r in interpolate.idw_grid(
            spark, sites, LON0, LAT0, 2, 2, CELL, k=3, power=2
        ).collect()
    }
    assert out[0]["value"] == 42.5 and out[0]["min_dist"] == 0.0
    assert all(r["n_sites"] == 3 for r in out.values())


def test_voronoi_k1_nearest(spark, sites_df):
    # k=1, any power: each node takes its single nearest site's value
    got = {
        r["node_id"]: r["value"]
        for r in interpolate.idw_grid(
            spark, sites_df, LON0, LAT0, NX, NY, CELL, k=1, power=2
        ).collect()
    }
    sites = _sites()
    for nid, lon, lat in _node_list():
        best = min(
            (
                ((lon - s[1]) ** 2 + (lat - s[2]) ** 2, s[0], s[3])
                for s in sites
            )
        )
        assert got[nid] == best[2], nid


def test_surface_feeds_raster_grid(spark, sites_df):
    # composition check: the produced (ix, iy, value) frame groups like a
    # raster (every cell present exactly once)
    surf = interpolate.idw_grid(
        spark, sites_df, LON0, LAT0, NX, NY, CELL, k=4
    )
    assert surf.count() == NX * NY
    assert surf.select("ix", "iy").distinct().count() == NX * NY
    assert surf.filter("value IS NULL").count() == 0
