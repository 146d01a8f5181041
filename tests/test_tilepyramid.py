"""Tile-pyramid rollup: DuckDB value oracle + plan shape + quadkey scheme.

Oracle strategy: the fixture's lon/lat step sizes are dyadic (360/1024,
180/1024) so every grid assignment is IEEE-exact in both engines; values
are small ints so count/sum/min/max are exact. The DuckDB oracle regroups
RAW points per zoom (the naive L-scan formulation) while the engine merges
re-aggregable partials up the pyramid — agreement proves the rollup
algebra, not just the arithmetic.
"""

from __future__ import annotations

import re

import pandas as pd
import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import tilepyramid as tp

RES_MAX = 6
RES_MIN = 2
N = 5000


def _pts_pdf() -> pd.DataFrame:
    ids = range(N)
    return pd.DataFrame(
        {
            "lon": [-180.0 + (i * 7 % 1024) * (360.0 / 1024.0) for i in ids],
            "lat": [-90.0 + (i * 13 % 1024) * (180.0 / 1024.0) for i in ids],
            "v": [i * 31 % 97 for i in ids],
        }
    )


@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame(_pts_pdf()).localCheckpoint()


def test_pyramid_matches_duckdb_per_level_regroup(spark, pts):
    got = (
        tp.tile_pyramid(
            pts, res_max=RES_MAX, res_min=RES_MIN, value_col="v"
        )
        .orderBy("res", "ix", "iy")
        .collect()
    )
    import duckdb

    con = duckdb.connect()
    con.register("pts", _pts_pdf())
    n = 1 << RES_MAX
    want = con.sql(
        f"""
        WITH base AS (
          SELECT
            CAST(least(greatest(floor((lon + 180e0) / 360e0 * {n}e0), 0),
                       {n - 1}) AS BIGINT) AS bx,
            CAST(least(greatest(floor((lat + 90e0) / 180e0 * {n}e0), 0),
                       {n - 1}) AS BIGINT) AS by,
            v
          FROM pts
        ), levels AS (
          SELECT unnest(range(0, {RES_MAX - RES_MIN + 1})) AS s
        )
        SELECT {RES_MAX} - s AS res, bx >> s AS ix, by >> s AS iy,
               count(*) AS n_points, sum(v) AS sum_v,
               min(v) AS min_v, max(v) AS max_v
        FROM base, levels
        GROUP BY 1, 2, 3
        ORDER BY res, ix, iy
        """
    ).fetchall()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g.res, g.ix, g.iy, g.n_points, g.sum_v, g.min_v, g.max_v) == tuple(w)


def test_exactly_two_exchanges_regardless_of_levels(spark, pts):
    """The pyramid must shuffle the fact table once and the base tiles once
    — never once per zoom level (the naive formulation's L-scan)."""
    for res_min in (0, RES_MAX):
        df = tp.tile_pyramid(pts, res_max=RES_MAX, res_min=res_min, value_col="v")
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        n_shuffles = plan.count("Aggregate")
        assert n_shuffles >= 2  # partial+final pairs collapse in optimized plan
        phys = df._jdf.queryExecution().executedPlan().toString()
        assert len(re.findall(r"(?<!Broadcast)Exchange", phys)) == 2, phys


def test_root_tile_is_global_aggregate(spark, pts):
    root = (
        tp.tile_pyramid(pts, res_max=RES_MAX, res_min=0, value_col="v")
        .where(F.col("res") == 0)
        .collect()
    )
    pdf = _pts_pdf()
    assert len(root) == 1
    r = root[0]
    assert (r.ix, r.iy) == (0, 0)
    assert r.n_points == N
    assert r.sum_v == int(pdf.v.sum())
    assert r.min_v == int(pdf.v.min()) and r.max_v == int(pdf.v.max())


def _quadkey_ref(ix: int, iy: int, res: int) -> str:
    """Independent re-derivation: walk zoom levels MSB-first (the public
    slippy-map construction — digit = 2*y_bit + x_bit per level)."""
    digits = []
    for k in range(res - 1, -1, -1):
        digits.append(str((((iy >> k) & 1) << 1) | ((ix >> k) & 1)))
    return "".join(digits)


def test_quadkey_matches_reference_construction(spark):
    rows = [(ix, iy, r) for r in (0, 1, 3, 7) for ix in range(1 << r) for iy in (0, (1 << r) - 1, (1 << r) // 2)]
    df = spark.createDataFrame(rows, "ix long, iy long, res int").select(
        "ix", "iy", "res", tp.quadkey(F.col("ix"), F.col("iy"), F.col("res")).alias("qk")
    )
    for row in df.collect():
        assert row.qk == _quadkey_ref(row.ix, row.iy, row.res), row


def test_quadkey_prefix_property(spark):
    """A tile's quadkey is a prefix of every descendant's quadkey — the
    property tile caches and prefix range-scans rely on."""
    base = [(ix, iy) for ix in range(16) for iy in range(16)]
    df = spark.createDataFrame(base, "ix long, iy long").select(
        tp.quadkey(F.col("ix"), F.col("iy"), F.lit(4)).alias("child"),
        tp.quadkey(
            F.shiftrightunsigned("ix", 2), F.shiftrightunsigned("iy", 2), F.lit(2)
        ).alias("parent"),
    )
    bad = df.where(~F.col("child").startswith(F.col("parent"))).count()
    assert bad == 0
