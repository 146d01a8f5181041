"""Raster<->vector zonal statistics and depth-weighted aggregation.

Capability parity (SURVEY.md §2.9 R12, §2.4 A5/A7/A15): the reference masks a
raster to polygons then takes masked mean/count (demeter/raster/utils/mask.py
+ numpy.ma stats, e.g. tests/raster/usgs/test_topography.py:30-33), and
depth-weights soil properties with null-aware semantics — masked values drop
out of numerator AND denominator, all-masked groups yield NULL
(demeter/vector/usda/ssurgo.py:270-301, numpy.ma.average).

Spark shape: raster cells are rows; cell centers join polygons through the
same cover-join + PIP machinery as pages (one engine, two fact tables), then
plain groupBy aggregates. NULL-skipping of avg/count matches masked-pixel
semantics exactly; the weighted mean is expressed as
sum(v*w)/sum(w FILTER v IS NOT NULL) — pure Catalyst expressions, partial+
final hash aggregation, no UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demeter_spark.operators.joins import spatial_join


def cells_in_parcels(
    cells: DataFrame, parcels: DataFrame, res: int = 8, **join_kw
) -> DataFrame:
    """Assign raster cells (by center) to containing parcels — the
    rasterized-PIP mask (R1, rasterio default all_touched=False) as a join.
    For the reference's production masking semantics (all_touched=True at
    demeter/raster/usgs/utils.py:50, polaris.py:274, slga.py:212,
    sentinel2/ndvi.py:434) use ``touched_cells_in_parcels``."""
    return spatial_join(cells, parcels, res=res, lon="cx", lat="cy", **join_kw)


def rasterize_touched(
    parcels: DataFrame,
    rx: float,
    ry: float,
    ox: float = 0.0,
    oy: float = 0.0,
    id_col: str = "parcel_id",
    wkt_col: str = "geom_wkt",
) -> DataFrame:
    """all_touched=True rasterization (R1 variant): one (id, ix, iy) row per
    grid box whose open interior overlaps the polygon — rasterio
    ``mask(..., all_touched=True)`` / ``rasterize(all_touched=True)`` as a
    distributed cell table (demeter/raster/utils/mask.py wraps rasterio.mask;
    tests/raster/utils/test_mask.py is the truth-table model).

    Runs as mapInPandas over the polygon dimension — per-polygon numpy
    kernel (center PIP + Liang-Barsky edge-vs-open-box), no driver geometry,
    embarrassingly parallel across parcels; output is a keyed mask table any
    cell fact table equi-joins against.
    """
    from demeter_spark.functions import geom

    def _touched(batches):
        for pdf in batches:
            ids: list = []
            ixs: list[np.ndarray] = []
            iys: list[np.ndarray] = []
            for pid, wkt in zip(pdf[id_col], pdf[wkt_col]):
                parts = geom.parse_wkt_polygons(wkt)
                tx, ty = geom.touched_grid_boxes(parts, ox, oy, rx, ry)
                ids.extend([pid] * len(tx))
                ixs.append(tx)
                iys.append(ty)
            if ids:
                yield pd.DataFrame(
                    {
                        id_col: np.asarray(ids, dtype=np.int64),
                        "ix": np.concatenate(ixs),
                        "iy": np.concatenate(iys),
                    }
                )

    spark = parcels.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    return (
        parcels.select(id_col, wkt_col)
        .repartition(n_parts, id_col)
        .mapInPandas(_touched, f"{id_col} BIGINT, ix BIGINT, iy BIGINT")
    )


def touched_cells_in_parcels(
    cells: DataFrame,
    parcels: DataFrame,
    rx: float,
    ry: float,
    ox: float = 0.0,
    oy: float = 0.0,
    broadcast_mask: bool = True,
) -> DataFrame:
    """Assign raster cells to parcels under all_touched=True semantics: the
    mask table comes straight from ``rasterize_touched`` and the assignment
    is a plain (broadcastable) equi-join on (ix, iy) — no PIP refine needed,
    classification happened in the per-parcel kernel."""
    mask = rasterize_touched(parcels, rx, ry, ox, oy)
    if broadcast_mask:
        mask = F.broadcast(mask)
    return cells.withColumn("ix", F.col("ix").cast("bigint")).withColumn(
        "iy", F.col("iy").cast("bigint")
    ).join(mask, ["ix", "iy"])


def zonal_stats(
    cells: DataFrame,
    parcels: DataFrame,
    keys: tuple[str, ...] = ("parcel_id", "dataset", "depth_lo"),
    res: int = 8,
) -> DataFrame:
    """Per-parcel (x dataset x depth) masked summary stats.

    count counts valid (non-null) pixels; avg/min/max/sum skip nulls — the
    numpy.ma semantics of the reference's fingerprint oracles (A15).
    """
    joined = cells_in_parcels(cells, parcels, res=res)
    return joined.groupBy(*[F.col(k) for k in keys]).agg(
        F.count("value").alias("n_valid"),
        F.avg("value").alias("mean_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("value").alias("sum_value"),
    )


def zonal_stats_touched(
    cells: DataFrame,
    parcels: DataFrame,
    rx: float,
    ry: float,
    ox: float = 0.0,
    oy: float = 0.0,
    keys: tuple[str, ...] = ("parcel_id", "dataset", "depth_lo"),
) -> DataFrame:
    """zonal_stats under the reference's production mask semantics
    (all_touched=True): edge pixels with ANY overlap contribute, matching
    rasterio.mask at every reference call site (usgs/utils.py:50,
    polaris.py:274, slga.py:212, ndvi.py:434)."""
    joined = touched_cells_in_parcels(cells, parcels, rx, ry, ox, oy)
    return joined.groupBy(*[F.col(k) for k in keys]).agg(
        F.count("value").alias("n_valid"),
        F.avg("value").alias("mean_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.sum("value").alias("sum_value"),
    )


def zonal_stats_weighted(
    cells: DataFrame,
    parcels: DataFrame,
    cell_deg: float,
    supersample: int = 4,
    res: int = 8,
    keys: tuple[str, ...] = ("parcel_id", "dataset", "depth_lo"),
) -> DataFrame:
    """AREA-WEIGHTED zonal stats via supersampled coverage fractions —
    the exactextract-style 'weighted mean' between center masking (R1
    default) and all_touched: each pixel contributes with weight = number
    of its supersample^2 subcell centers inside the polygon (an integer,
    so every aggregate stays exact and engine-reproducible; the fraction is
    w / supersample^2, quantized by design).

    Plan shape: the subcenter fan-out is a Catalyst explode feeding the
    SAME cover-join + PIP machinery as every other point workload; weights
    reduce map-side (partial count per pixel) before the weighted mean.
    """
    s = int(supersample)
    sub = float(cell_deg) / s
    pts = cells.selectExpr(
        "*",
        f"explode(sequence(0, {s * s - 1})) AS _sub",
    ).selectExpr(
        "*",
        # same textual arithmetic as the oracle: dyadic grid offsets
        f"ix * {cell_deg}e0 + (CAST(_sub % {s} AS DOUBLE) + 0.5e0) * {sub}e0 AS scx",
        f"iy * {cell_deg}e0 + (CAST(_sub div {s} AS DOUBLE) + 0.5e0) * {sub}e0 AS scy",
    )
    hits = spatial_join(pts, parcels, res=res, lon="scx", lat="scy")
    per_pixel = hits.groupBy(
        *[F.col(k) for k in keys], F.col("ix"), F.col("iy"), F.col("value")
    ).agg(F.count("*").alias("_w"))
    w = F.col("_w").cast("double")
    v = F.col("value")
    return per_pixel.groupBy(*[F.col(k) for k in keys]).agg(
        (
            F.sum(v * w) / F.sum(F.when(v.isNotNull(), w))
        ).alias("w_mean"),
        F.sum(F.when(v.isNotNull(), w)).alias("w_valid"),
        F.count(v).alias("n_pixels"),
        F.sum(F.when(v.isNotNull(), F.col("_w"))).cast("bigint").alias("n_subhits"),
    )


def depth_weighted_mean(
    cells_joined: DataFrame,
    query_lo: int,
    query_hi: int,
    value_col: str = "value",
    group: tuple[str, ...] = ("parcel_id",),
) -> DataFrame:
    """Null-aware depth-weighted mean over a depth range (A5/A7).

    weight = clipped interval overlap of [depth_lo, depth_hi) with
    [query_lo, query_hi); rows with NULL value contribute to neither
    numerator nor denominator; all-NULL groups -> NULL (ssurgo.py:289-297).
    """
    w = F.greatest(
        F.lit(0),
        F.least(F.lit(query_hi), F.col("depth_hi"))
        - F.greatest(F.lit(query_lo), F.col("depth_lo")),
    ).cast("double")
    v = F.col(value_col)
    return (
        cells_joined.withColumn("_w", w)
        .filter(F.col("_w") > 0)
        .groupBy(*[F.col(g) for g in group])
        .agg(
            (
                F.sum(v * F.col("_w"))
                / F.sum(F.when(v.isNotNull(), F.col("_w")))
            ).alias("dw_mean"),
            F.sum(F.when(v.isNotNull(), F.col("_w"))).alias("w_valid"),
        )
    )
