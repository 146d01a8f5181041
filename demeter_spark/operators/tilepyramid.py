"""Slippy-map tile pyramid: multi-zoom rollup of point aggregates.

Capability parity (SURVEY.md §2.9 R9/R10 + north_rule "tiling"): the
reference enumerates flat 1x1-degree tile covers (demeter/raster/utils.py:
33-57) — a single-zoom view. A web-map/tiling engine serves EVERY zoom at
once: per-tile aggregates at a base zoom plus all coarser ancestors, the
standard XYZ/quadkey pyramid (public slippy-map tile scheme). This module
builds that pyramid as a relational plan.

Spark shape (scale posture at 10^12 points):

1. ``grid_xy`` assigns (ix, iy) at the base resolution — pure Catalyst
   floor arithmetic, identical formulation to ``spark_udfs.cell_of`` so the
   assignment stays inside whole-stage codegen with no Python.
2. ONE groupBy(ix, iy) reduces the fact table to at most 4^res_max base
   tiles (partial aggregation combines map-side, so the shuffle carries
   tile partials, not points).
3. The ancestor explode runs on the AGGREGATED base rows — fan-out factor
   (res_max - res_min + 1) applies post-reduction, never to raw points —
   followed by one more groupBy on (res, ix, iy) merging re-aggregable
   partials (count/sum/min/max; mean derived).

Total: exactly two Exchanges regardless of input size (plan-asserted in
tests/test_tilepyramid.py), both behind map-side combine. The same rollup
re-grouped from raw points per level would scan the fact table L times or
shuffle L copies of it; this shape shuffles it once.

Tile ids interoperate with the Morton cellgrid: (ix, iy, res) are the grid
coordinates cellgrid.encode consumes, and ``quadkey`` emits the standard
base-4 string key (digit = 2*y_bit + x_bit, MSB first) used by public XYZ
tile services — which is precisely the Morton index written in base 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "grid_xy",
    "quadkey",
    "tile_pyramid",
    "rollup_base",
    "incremental_tile_pyramid",
]


def grid_xy(lon: Column, lat: Column, res: int) -> tuple[Column, Column]:
    """(lon, lat) -> integer grid coordinates at resolution ``res``.

    Same clip+floor formulation as spark_udfs.cell_of (equivalence is the
    established cross-engine-exact cell assignment used by the oracle-green
    spatial_join): ix in [0, 2^res), x east from -180; iy south from -90.
    """
    n = 1 << res

    def _clip(idx: Column) -> Column:
        return F.least(F.greatest(idx, F.lit(0)), F.lit(n - 1)).cast("long")

    ix = _clip(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(n))))
    iy = _clip(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(n))))
    return ix, iy


def quadkey(ix: Column, iy: Column, res: Column | int) -> Column:
    """Standard slippy-map quadkey string for tile (ix, iy) at zoom ``res``.

    Digit k (MSB first) = 2*bit_k(iy) + bit_k(ix) — i.e. the Morton
    interleave of (ix, iy) rendered in base 4, left-padded to ``res``
    digits. Pure Catalyst: the same magic-number bit spread as
    spark_udfs.cell_of, then ``conv(morton, 10, 4)``. Zoom 0 is the empty
    string (the single world tile), matching the public scheme.
    """

    def _spread(v: Column) -> Column:
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            v = (v.bitwiseOR(F.shiftleft(v, shift))).bitwiseAND(F.lit(mask))
        return v

    morton = _spread(ix).bitwiseOR(F.shiftleft(_spread(iy), 1))
    res_col = F.lit(res) if isinstance(res, int) else res
    return F.when(res_col == 0, F.lit("")).otherwise(
        F.lpad(F.conv(morton.cast("string"), 10, 4), res_col, "0")
    )


def tile_pyramid(
    points: DataFrame,
    res_max: int,
    res_min: int = 0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str | None = None,
    with_quadkey: bool = False,
) -> DataFrame:
    """Per-tile aggregates at every zoom in [res_min, res_max].

    Output: (res, ix, iy, n_points[, sum_v, min_v, max_v][, quadkey]) —
    one row per non-empty tile per zoom. count/sum/min/max are exact and
    re-aggregable, so ancestor rows merge child partials instead of
    re-scanning points (see module docstring for the two-Exchange shape).
    """
    if not 0 <= res_min <= res_max:
        raise ValueError(f"need 0 <= res_min <= res_max, got {res_min}..{res_max}")
    ix, iy = grid_xy(F.col(lon_col), F.col(lat_col), res_max)
    base_cols = [ix.alias("ix"), iy.alias("iy")]
    aggs = [F.count(F.lit(1)).alias("n_points")]
    merge_aggs = [F.sum("n_points").alias("n_points")]
    if value_col is not None:
        base_cols.append(F.col(value_col).alias("_v"))
        aggs += [
            F.sum("_v").alias("sum_v"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        ]
        merge_aggs += [
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        ]
    base = points.select(*base_cols).groupBy("ix", "iy").agg(*aggs)
    pyr = rollup_base(base, res_max, res_min, merge_aggs)
    if with_quadkey:
        pyr = pyr.withColumn(
            "quadkey", quadkey(F.col("ix"), F.col("iy"), F.col("res"))
        )
    return pyr


def _merge_aggs(value_col: str | None) -> list[Column]:
    aggs = [F.sum("n_points").alias("n_points")]
    if value_col is not None:
        aggs += [
            F.sum("sum_v").alias("sum_v"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        ]
    return aggs


def rollup_base(
    base: DataFrame,
    res_max: int,
    res_min: int,
    merge_aggs: list[Column],
) -> DataFrame:
    """Ancestor rollup of base-tile partials (re-aggregable stats only):
    explode runs on AGGREGATED rows, then one groupBy merges every zoom."""
    levels = res_max - res_min
    return (
        base.select(
            F.explode(F.expr(f"sequence(0, {levels})")).alias("_s"),
            "*",
        )
        .select(
            (F.lit(res_max) - F.col("_s")).alias("res"),
            F.expr("shiftrightunsigned(ix, _s)").alias("ix"),
            F.expr("shiftrightunsigned(iy, _s)").alias("iy"),
            *[c for c in base.columns if c not in ("ix", "iy")],
        )
        .groupBy("res", "ix", "iy")
        .agg(*merge_aggs)
    )


def incremental_tile_pyramid(
    log,
    points_increment: DataFrame,
    inc_id: int,
    res_max: int,
    res_min: int = 0,
    lon_col: str = "lon",
    lat_col: str = "lat",
    value_col: str | None = None,
    stage: str = "tile_pyramid_parts",
    n_parts: int = 8,
) -> DataFrame:
    """Continuous-crawl tile index: fold an increment of new points into a
    LineageLog-backed pyramid, exactly once, and return the CURRENT pyramid.

    State (stage ``tile_pyramid_parts``) holds BASE-zoom partials per
    increment — count/sum/min/max are re-aggregable, so the serve-side
    pyramid is derived by one rollup over the committed partials; no
    committed tile is ever rewritten by later increments.

    - partitions are keyed (inc_id, tile-hash bucket) composited into one
      long, so each increment owns DISTINCT partitions — dynamic overwrite
      can never clobber an earlier increment's partials (the same
      composite-key contract as incremental MinHash dedup);
    - work per increment: aggregate the increment's points to base tiles
      (one shuffle over increment rows only) + the read-side rollup —
      committed increments are scanned as pre-aggregated partials
      (parquet, bounded by distinct tiles, not by points);
    - crash/replay of the same increment is healed by write_increment's
      idempotent partition overwrite; the union over increments equals
      the batch tile_pyramid over all points (pytest-pinned, exact ints).
    """
    ix, iy = grid_xy(F.col(lon_col), F.col(lat_col), res_max)
    cols = [ix.alias("ix"), iy.alias("iy")]
    aggs = [F.count(F.lit(1)).alias("n_points")]
    if value_col is not None:
        cols.append(F.col(value_col).alias("_v"))
        aggs += [
            F.sum("_v").alias("sum_v"),
            F.min("_v").alias("min_v"),
            F.max("_v").alias("max_v"),
        ]
    base_inc = (
        points_increment.select(*cols)
        .groupBy("ix", "iy")
        .agg(*aggs)
        .withColumn(
            "part_key",
            F.lit(int(inc_id) * n_parts)
            + F.pmod(F.xxhash64("ix", "iy"), F.lit(n_parts)),
        )
    )
    log.write_increment(stage, base_inc, "part_key", f"tiles-{inc_id}")
    committed = log.read_stage(stage).drop("part_key", "_part")
    return rollup_base(committed, res_max, res_min, _merge_aggs(value_col))
