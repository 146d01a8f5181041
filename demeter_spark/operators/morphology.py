"""Grid morphology: erode / dilate / open / close masks, majority filter,
and focal min/max/mean — the classic raster cleanup pass.

Capability extension of the reference's mask machinery: demeter rasterizes
polygon masks and applies them (demeter/raster/utils/mask.py:35-97,
cloud/footprint masking demeter/raster/sentinel2/ndvi.py:357-396) but has
no way to CLEAN a mask — despeckling single-pixel noise, filling pinholes,
smoothing classification rasters — which is the standard next step
(GDAL sieve / focal statistics, public algorithms).

Spark shape (same one-Exchange discipline as the Horn stencil,
terrain.py): every cell explodes into its neighborhood contributions
(map-side x|window|), ONE groupBy(ix, iy) reduces — partial aggregation
combines map-side, so the single shuffle carries per-cell partials. All
reductions here are order-independent (min/max/sum/count), so results are
exact and engine-independent (SQL-oracle-checkable end to end — no trig,
no floats except focal_mean's single final division of exact integers).

Edge semantics: erosion requires FULL support (an edge cell lacking
neighbors erodes — the conservative reading used by binary morphology on
padded-with-zero rasters); dilation ors whatever neighbors exist. The
majority filter emits only cells with full support, like the Horn
derivatives (no invented data at edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "erode",
    "dilate",
    "opening",
    "closing",
    "majority_filter",
    "focal_stats",
]


def _neighborhood(
    cells: DataFrame,
    radius: int,
    ix_col: str,
    iy_col: str,
    value_col: str,
) -> DataFrame:
    """Explode each source cell onto every target within the square
    (2r+1)^2 window (Chebyshev ball — the 8-connected structuring element
    at r=1); output one contribution row per (target, source)."""
    d = 2 * radius + 1
    return cells.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, {d * d - 1}), o -> struct("
                f"o div {d} - {radius} AS ox, o % {d} - {radius} AS oy))"
            )
        ).alias("_o"),
        F.col(ix_col).alias("_sx"),
        F.col(iy_col).alias("_sy"),
        F.col(value_col).alias("_v"),
    ).select(
        (F.col("_sx") - F.col("_o.ox")).alias("ix"),
        (F.col("_sy") - F.col("_o.oy")).alias("iy"),
        F.col("_v"),
    )


def erode(
    mask: DataFrame,
    radius: int = 1,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "m",
) -> DataFrame:
    """Binary erosion: cell stays 1 only if EVERY cell in its window is 1
    (missing rows count as 0, so grid edges erode). Input rows are the
    sparse 1-cells (0-cells may be present or absent; value 0 erodes its
    window like a missing row). Output: the surviving 1-cells (ix, iy, m=1).
    """
    d = 2 * radius + 1
    nb = _neighborhood(
        mask.filter(F.col(value_col) != 0), radius, ix_col, iy_col, value_col
    )
    return (
        nb.groupBy("ix", "iy")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == d * d)
        .select("ix", "iy", F.lit(1).alias(value_col))
    )


def dilate(
    mask: DataFrame,
    radius: int = 1,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "m",
) -> DataFrame:
    """Binary dilation: every cell within ``radius`` of a 1-cell becomes 1.
    Output: the dilated 1-cells (sparse; includes cells absent from the
    input)."""
    nb = _neighborhood(
        mask.filter(F.col(value_col) != 0), radius, ix_col, iy_col, value_col
    )
    return (
        nb.groupBy("ix", "iy")
        .agg(F.count(F.lit(1)).alias("_n"))
        .select("ix", "iy", F.lit(1).alias(value_col))
    )


def opening(mask: DataFrame, radius: int = 1, **kw) -> DataFrame:
    """Erosion then dilation — removes specks smaller than the window."""
    return dilate(erode(mask, radius, **kw), radius, **kw)


def closing(mask: DataFrame, radius: int = 1, **kw) -> DataFrame:
    """Dilation then erosion — fills pinholes smaller than the window."""
    return erode(dilate(mask, radius, **kw), radius, **kw)


def majority_filter(
    cells: DataFrame,
    radius: int = 1,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Modal (majority) filter over the window — the classification-raster
    smoother. Emits only full-support cells; ties break to the SMALLEST
    class value (deterministic, engine-independent). Two Exchanges: the
    per-(cell, class) count and the per-cell argmax."""
    d = 2 * radius + 1
    nb = _neighborhood(cells, radius, ix_col, iy_col, value_col)
    counts = nb.groupBy("ix", "iy", "_v").agg(F.count(F.lit(1)).alias("_n"))
    return (
        counts.groupBy("ix", "iy")
        .agg(
            F.sum("_n").alias("_support"),
            F.max_by(
                F.col("_v"), F.struct(F.col("_n"), -F.col("_v"))
            ).alias(value_col),
        )
        .where(F.col("_support") == d * d)
        .select("ix", "iy", value_col)
    )


def focal_stats(
    cells: DataFrame,
    radius: int = 1,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Focal min / max / sum / count / mean over the window (full-support
    cells only). min/max/sum/count are exact; mean is one division of two
    exact integers (for integer inputs) — all oracle-safe."""
    d = 2 * radius + 1
    nb = _neighborhood(cells, radius, ix_col, iy_col, value_col)
    return (
        nb.groupBy("ix", "iy")
        .agg(
            F.min("_v").alias("f_min"),
            F.max("_v").alias("f_max"),
            F.sum("_v").alias("f_sum"),
            F.count(F.lit(1)).alias("f_n"),
        )
        .where(F.col("f_n") == d * d)
        .selectExpr(
            "ix",
            "iy",
            "f_min",
            "f_max",
            "f_sum",
            "f_n",
            "CAST(f_sum AS DOUBLE) / f_n AS f_mean",
        )
    )
