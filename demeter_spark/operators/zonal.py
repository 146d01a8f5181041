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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demeter_spark.operators.joins import spatial_join


def cells_in_parcels(
    cells: DataFrame, parcels: DataFrame, res: int = 8, **join_kw
) -> DataFrame:
    """Assign raster cells (by center) to containing parcels — the
    rasterized-PIP mask (R1) as a join."""
    return spatial_join(cells, parcels, res=res, lon="cx", lat="cy", **join_kw)


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
