"""Grid-to-grid resampling and alignment (reproject/align analogues).

Capability parity (SURVEY.md §2.9 R4-R8): the reference warps rasters with
rasterio (15 resampling kernels, demeter/raster/utils/reprojection.py:15-112),
snaps transforms to a common grid (reprojection.py:251-272,
transform.py:19-40) and asserts grid alignment before merging
(merge.py:337-350). On the cell-table model those become integer index maps:

- ``coarsen``: factor-f downsample with an aggregation kernel (average /
  min / max / count — the reference's Resampling.average path): one groupBy
  on (ix div f, iy div f);
- ``refine_nearest``: factor-f upsample by nearest neighbor: each source
  cell explodes into f x f children (Resampling.nearest);
- ``align_check``: every dataset must share (res, origin mod res) — the R4
  aligned-grid assertion as a one-row aggregate;
- ``snap_bounds``: bounds -> enclosing grid-aligned bounds (R5,
  transform.py:19-40 floor-unless-close).

All pure Catalyst expressions — no UDFs, no shuffles beyond the one groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coarsen(
    cells: DataFrame,
    factor: int,
    keys: tuple[str, ...] = ("dataset",),
    value: str = "value",
) -> DataFrame:
    """Factor-f downsample with average/min/max/count kernels (null-skipping,
    masked semantics preserved: all-null blocks yield NULL mean)."""
    # floor semantics (not truncate-toward-zero): floor keeps negative
    # indices in their own parent block — trunc(-1/4)=0 would silently merge
    # blocks across the origin (ADVICE round 1)
    gb = [F.col(k) for k in keys] + [
        F.floor(F.col("ix") / F.lit(factor)).cast("bigint").alias("ix"),
        F.floor(F.col("iy") / F.lit(factor)).cast("bigint").alias("iy"),
    ]
    v = F.col(value)
    return cells.groupBy(*gb).agg(
        F.count(v).alias("n_valid"),
        F.avg(v).alias("mean_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
    )


def refine_nearest(
    cells: DataFrame,
    factor: int,
    keys: tuple[str, ...] = ("dataset",),
    value: str = "value",
) -> DataFrame:
    """Factor-f nearest-neighbor upsample: each cell -> f*f children carrying
    the parent value (Resampling.nearest)."""
    f2 = factor * factor
    return (
        cells.withColumn("_k", F.explode(F.expr(f"sequence(0, {f2 - 1})")))
        .selectExpr(
            *keys,
            f"ix * {factor} + _k % {factor} AS ix",
            f"iy * {factor} + _k div {factor} AS iy",
            value,
        )
    )


def align_check(tiles: DataFrame) -> DataFrame:
    """R4: all datasets must share one pixel grid — distinct (res, origin mod
    res) per dataset; >1 distinct grid = misaligned (caller asserts/metrics)."""
    return (
        tiles.selectExpr(
            "dataset",
            "res",
            "pmod(tile_x * width * res, res) AS off_x",
            "pmod(tile_y * height * res, res) AS off_y",
        )
        .groupBy("dataset")
        .agg(F.countDistinct("res", "off_x", "off_y").alias("n_grids"))
    )


def snap_bounds(
    bounds: DataFrame, res: float, cols: tuple[str, str, str, str] = (
        "xmin", "ymin", "xmax", "ymax"
    )
) -> DataFrame:
    """R5: expand bounds outward to the pixel grid (floor/ceil in units of
    res — transform.py:19-40 without the float-tolerance special case, which
    synthetic grids don't need)."""
    x0, y0, x1, y1 = cols
    return bounds.withColumns(
        {
            x0: F.floor(F.col(x0) / res) * res,
            y0: F.floor(F.col(y0) / res) * res,
            x1: F.ceil(F.col(x1) / res) * res,
            y1: F.ceil(F.col(y1) / res) * res,
        }
    )


def greedy_min_cover(tile_cells: dict[int, set[int]], needed: set[int]) -> list[int]:
    """R10: smallest tile subset covering ``needed`` cells (greedy set cover,
    deterministic tie-break by tile id — tiles.py:136-152 equivalent).

    Driver-side: the candidate tile list is a small dimension by construction
    (the reference enumerates <= dozens of tiles per query)."""
    remaining = set(needed)
    chosen: list[int] = []
    while remaining:
        best = max(
            sorted(tile_cells),
            key=lambda t: len(tile_cells[t] & remaining),
        )
        gain = len(tile_cells[best] & remaining)
        if gain == 0:
            raise ValueError("cells not coverable by candidate tiles")
        chosen.append(best)
        remaining -= tile_cells[best]
    return chosen
