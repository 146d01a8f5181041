"""Spatial joins: cell-cover equi-join + exact point-in-polygon refinement.

The flagship operator (SURVEY.md §2.3 J1, §4 T4): the reference executes
spatial theta-joins by shipping STIntersects to a remote SQL engine
(demeter/vector/usda/ssurgo.py:22-31) or by bbox-prefilter + exact
``GeoSeries.intersects`` refine (demeter/raster/usgs/hydrography.py:376-399).
Here the same filter-refine pattern is Spark-native:

1. polygons -> covering cell ids at resolution R (``polyfill``, a conservative
   superset — never misses a containing cell);
2. points -> cell id at R (one vectorized UDF);
3. **equi-join on cell id** — plain Catalyst join, so broadcast/SMJ selection,
   AQE skew-splitting and partition pruning all apply unmodified;
4. exact PIP refine in a vectorized pandas UDF (polygon rings shipped via a
   Spark broadcast variable, grouped evaluation per polygon inside each Arrow
   batch).

Compact covers (H3 compact analogue) shrink the build side for large
polygons: the point side then explodes each point cell into its ancestor
chain (res R .. R_min) and joins on any level.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from demeter_spark.functions import cellgrid as cg
from demeter_spark.functions import geom
from demeter_spark.functions.spark_udfs import ancestors_of, cell_of

DEFAULT_RES = 7  # ~2.8 x 1.4 deg cells; tuned per dataset via argument


def parcel_covers(
    parcels: DataFrame, res: int = DEFAULT_RES, compact: bool = False
) -> DataFrame:
    """(parcel_id, geom_wkt) -> exploded (parcel_id, cell) cover table.

    Runs as mapInPandas over the polygon dimension: per-polygon WKT parse +
    vectorized polyfill. Polygon count is the *dimension* cardinality (small
    relative to pages), and each polygon's fill is a numpy kernel.
    """

    def _covers(batches):
        for pdf in batches:
            ids: list[int] = []
            cells: list[np.ndarray] = []
            for pid, wkt in zip(pdf["parcel_id"], pdf["geom_wkt"]):
                acc: list[np.ndarray] = []
                for xs, ys in geom.parse_wkt_rings(wkt):
                    acc.append(cg.polyfill(xs, ys, res))
                cs = np.unique(np.concatenate(acc))
                if compact:
                    cs = cg.compact(cs)
                ids.extend([pid] * len(cs))
                cells.append(cs)
            if cells:
                yield pd.DataFrame(
                    {"parcel_id": np.asarray(ids, dtype=np.int64),
                     "cell": np.concatenate(cells)}
                )

    return parcels.select("parcel_id", "geom_wkt").mapInPandas(
        _covers, "parcel_id BIGINT, cell BIGINT"
    )


def _pip_refine_udf(spark, parcels: DataFrame):
    """Vectorized PIP predicate over (lon, lat, parcel_id) candidate rows.

    Polygon rings travel as a broadcast dict {parcel_id: [(xs, ys), ...]} —
    the polygon dimension is broadcast-sized by design (strategy flag below
    covers the huge-dimension case with a grouped refine instead).
    """
    rings = {
        int(r["parcel_id"]): geom.parse_wkt_rings(r["geom_wkt"])
        for r in parcels.select("parcel_id", "geom_wkt").collect()
    }
    bc = spark.sparkContext.broadcast(rings)

    @F.pandas_udf(BooleanType())
    def _pip(lon: pd.Series, lat: pd.Series, pid: pd.Series) -> pd.Series:
        out = geom.points_in_rings_grouped(
            lon.to_numpy(), lat.to_numpy(), pid.to_numpy(), bc.value
        )
        return pd.Series(out)

    return _pip


def spatial_join(
    points: DataFrame,
    parcels: DataFrame,
    res: int = DEFAULT_RES,
    compact: bool = False,
    broadcast_cover: bool = True,
    lon: str = "lon",
    lat: str = "lat",
) -> DataFrame:
    """points ⨝ polygons (containment): returns points columns + parcel_id.

    ``compact=True`` joins point ancestor chains against a compacted cover
    (smaller build side, multi-res); otherwise fixed-res equi-join.
    ``broadcast_cover`` hints the cover side broadcast (the common case:
    polygon dimension << points fact table). With it off, Catalyst picks a
    shuffle join and AQE handles skewed hot cells.
    """
    spark = points.sparkSession
    covers = parcel_covers(parcels, res=res, compact=compact)
    if broadcast_cover:
        covers = F.broadcast(covers)

    pts = points.withColumn("_cell", cell_of(F.col(lon), F.col(lat), res))
    if compact:
        res_min = 0
        pts = pts.withColumn(
            "_anc", ancestors_of(F.col("_cell"), res_min)
        ).withColumn("_jcell", F.explode("_anc")).drop("_anc")
        cand = pts.join(covers, pts["_jcell"] == covers["cell"], "inner").drop(
            "cell", "_jcell"
        )
    else:
        cand = pts.join(covers, pts["_cell"] == covers["cell"], "inner").drop("cell")

    pip = _pip_refine_udf(spark, parcels)
    return (
        cand.filter(pip(F.col(lon), F.col(lat), F.col("parcel_id")))
        .drop("_cell")
    )


def knn_join(
    points: DataFrame,
    sites: DataFrame,
    k: int,
    res: int = 9,
    id_col: str = "url",
    site_id: str = "place_id",
    max_ring: int = 64,
) -> DataFrame:
    """k nearest ``sites`` per point via k-ring expansion (north_rule J12).

    Iterative doubling: at ring radius r, a point is *resolved* when it has
    >= k candidates with distance <= r * lat_cell_size (anything outside the
    ring is strictly farther, so its top-k is final). Unresolved points
    escalate to 2r. Final top-k via window rank. Distances are planar-degree
    Euclidean (documented engine semantics; synthetic world is planar).
    """
    lat_sz = 180.0 / (1 << res)
    site_cells = sites.withColumn("_scell", cell_of(F.col("lon"), F.col("lat"), res))
    site_cells = F.broadcast(
        site_cells.select(
            F.col(site_id).alias("_sid"),
            F.col("lon").alias("_slon"),
            F.col("lat").alias("_slat"),
            "_scell",
        )
    )

    pts = points.select(
        id_col, F.col("lon").alias("_plon"), F.col("lat").alias("_plat")
    ).withColumn("_pcell", cell_of(F.col("_plon"), F.col("_plat"), res))

    from demeter_spark.functions.spark_udfs import kring_of

    resolved_parts: list[DataFrame] = []
    remaining = pts
    r = 1
    while r <= max_ring:
        cand = (
            remaining.withColumn("_ring", F.explode(kring_of(F.col("_pcell"), r)))
            .join(site_cells, F.col("_ring") == F.col("_scell"), "inner")
            .drop("_ring", "_scell")
            .dropDuplicates([id_col, "_sid"])
            .withColumn(
                "_dist",
                F.sqrt(
                    F.pow(F.col("_plon") - F.col("_slon"), 2)
                    + F.pow(F.col("_plat") - F.col("_slat"), 2)
                ),
            )
        )
        from pyspark.sql import Window

        w = Window.partitionBy(id_col).orderBy("_dist", "_sid")
        ranked = cand.withColumn("_rk", F.row_number().over(w))
        kth = ranked.filter(F.col("_rk") == k).select(
            id_col, F.col("_dist").alias("_kth")
        )
        done_ids = kth.filter(F.col("_kth") <= r * lat_sz).select(id_col)
        if r * 2 > max_ring:  # last pass: accept whatever we have
            done_ids = ranked.select(id_col).distinct()
        resolved = ranked.join(F.broadcast(done_ids), id_col, "left_semi").filter(
            F.col("_rk") <= k
        )
        resolved_parts.append(
            resolved.select(
                id_col,
                F.col("_sid").alias(site_id),
                F.col("_rk").alias("rank"),
                F.col("_dist").alias("dist"),
            )
        )
        remaining = remaining.join(F.broadcast(done_ids), id_col, "left_anti")
        if remaining.isEmpty():
            break
        r *= 2

    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out
