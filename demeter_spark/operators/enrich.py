"""Multi-source point enrichment — the reference's front-end shape.

Capability parity (SURVEY.md §3.1, demeter/api.py:13-102 fetch_point_data):
for every geocoded page point, gather per-source attributes and join them
column-wise on the point key (the reference's pandas.concat(axis="columns")
becomes an explicit N-way equi-join on url — J7, made order-robust):

- containing parcel (J1 cover join; min parcel id if several + count),
- elevation at the point via raster-pixel lookup (J6 value_at analogue:
  affine inverse -> (ix, iy) -> equi-join on the cells table),
- nearest place + distance (J12 kNN, k=1),
- primary soil component attributes of the containing parcel (§3.2 pipeline,
  deterministic 1:1 via (comppct desc, component_key) top-1).

Every source subquery produces (url, cols...) and the final join is
broadcast-free on the fact side — the N-way join shuffles on url once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from demeter_spark.operators import joins, ssurgo_q
from demeter_spark.sources.synth import CELL_DEG


def enrich_points(
    points: DataFrame,
    parcels: DataFrame,
    elevation_cells: DataFrame,
    gazetteer: DataFrame,
    components: DataFrame,
    horizons: DataFrame,
    res: int = 8,
    broadcast_elevation: bool = False,
    broadcast_soil: bool = False,
) -> DataFrame:
    """``broadcast_elevation`` defaults False: a continental DEM is a
    fact-sized table (the reference's merged raster is 14934x4791 px for ten
    polygons, demeter/raster/usgs/topography.py) — broadcasting it is a
    100x-scale OOM. The (_ix,_iy) equi-join already has the right shape; let
    AQE pick the strategy, and opt in only for genuinely small rasters
    (VERDICT r03 #3).

    ``broadcast_soil`` defaults False for the same reason (VERDICT r04 #2):
    the soil frame is keyed by parcel_id and grows with the parcel dimension,
    so an unconditional broadcast has the same dimension-growth exposure the
    elevation gate closed. The parcel_id equi-join is the right shape either
    way; opt in when the parcel universe is known-small."""
    # source 1: containing parcel (1:1 by min id; count kept as a metric col)
    hits = joins.spatial_join(points, parcels, res=res).groupBy("url").agg(
        F.min("parcel_id").alias("parcel_id"),
        F.count("*").alias("n_parcels"),
    )

    # source 2: raster value_at (affine inverse -> cell equi-join, J6)
    px = points.withColumns(
        {
            "_ix": F.floor(F.col("lon") / CELL_DEG).cast("int"),
            "_iy": F.floor(F.col("lat") / CELL_DEG).cast("int"),
        }
    )
    cells = elevation_cells.select(
        F.col("ix").alias("_ix"),
        F.col("iy").alias("_iy"),
        F.col("value").alias("elevation"),
    )
    if broadcast_elevation:
        cells = F.broadcast(cells)
    elev = px.join(cells, ["_ix", "_iy"], "left").select("url", "elevation")

    # source 3: nearest place (kNN k=1)
    nn = joins.knn_join(points, gazetteer, k=1, res=6).select(
        "url",
        F.col("place_id").alias("nearest_place_id"),
        F.col("dist").alias("nearest_dist"),
    )

    # source 4: primary soil component of the containing parcel (1:1)
    prim = ssurgo_q.primary_components(components)
    w = Window.partitionBy("parcel_id").orderBy(
        F.desc("comppct"), F.asc("component_key")
    )
    prim1 = (
        prim.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("parcel_id", "component_key", "compname", "comppct")
    )
    props = ssurgo_q.depth_weighted_properties(
        ssurgo_q.horizons_in_range(horizons, prim1, 0, 50), 0, 50
    )
    soil = prim1.join(props, "component_key", "left").select(
        "parcel_id",
        F.col("compname").alias("soil_compname"),
        F.col("comppct").alias("soil_comppct"),
        F.col("sand_dw").alias("soil_sand_dw"),
    )

    # N-way column-wise assembly on the point key (J7, explicit keys — the
    # reference's positional zip is row-order-fragile, SURVEY.md §2.3)
    out = (
        points.select("url", "doc_id", "lon", "lat")
        .join(hits, "url", "left")
        .join(elev, "url", "left")
        .join(nn, "url", "left")
        .join(F.broadcast(soil) if broadcast_soil else soil, "parcel_id", "left")
    )
    return out.select(
        "url",
        "doc_id",
        "lon",
        "lat",
        "parcel_id",
        "n_parcels",
        "elevation",
        "nearest_place_id",
        "nearest_dist",
        "soil_compname",
        "soil_comppct",
        "soil_sand_dw",
    )
