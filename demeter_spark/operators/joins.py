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
            fulls: list[np.ndarray] = []
            for pid, wkt in zip(pdf["parcel_id"], pdf["geom_wkt"]):
                parts = geom.parse_wkt_polygons(wkt)
                per_ring = [cg.polyfill_part(p_, res, classify=True) for p_ in parts]
                cs = np.unique(np.concatenate([c for c, _ in per_ring]))
                # full in the union if full in any part (multipolygon parts
                # may overlap a cell another part only touches)
                full = np.zeros(len(cs), dtype=bool)
                for c, f in per_ring:
                    full |= np.isin(cs, c[f])
                # ...but never full if any part's boundary crosses it
                for c, f in per_ring:
                    full &= ~np.isin(cs, c[~f])
                if compact:
                    fc = cg.compact(cs[full])
                    bc = cs[~full]
                    cs = np.concatenate([fc, bc])
                    full = np.concatenate(
                        [np.ones(len(fc), dtype=bool), np.zeros(len(bc), dtype=bool)]
                    )
                ids.extend([pid] * len(cs))
                cells.append(cs)
                fulls.append(full)
            if cells:
                yield pd.DataFrame(
                    {
                        "parcel_id": np.asarray(ids, dtype=np.int64),
                        "cell": np.concatenate(cells),
                        "full": np.concatenate(fulls),
                    }
                )

    # spread polygons across tasks: the kernel is per-polygon numpy, so the
    # dimension-side fill parallelizes embarrassingly
    spark = parcels.sparkSession
    n_parts = max(spark.sparkContext.defaultParallelism, 2)
    return (
        parcels.select("parcel_id", "geom_wkt")
        .repartition(n_parts, "parcel_id")
        .mapInPandas(_covers, "parcel_id BIGINT, cell BIGINT, full BOOLEAN")
    )


def spatial_join(
    points: DataFrame,
    parcels: DataFrame,
    res: int = DEFAULT_RES,
    compact: bool = False,
    broadcast_cover: bool = True,
    lon: str = "lon",
    lat: str = "lat",
    hot_cells: list[int] | None = None,
    n_salt: int = 8,
    covers: DataFrame | None = None,
) -> DataFrame:
    """points ⨝ polygons (containment): returns points columns + parcel_id.

    ``compact=True`` joins point ancestor chains against a compacted cover
    (smaller build side, multi-res); otherwise fixed-res equi-join.
    ``broadcast_cover`` hints the cover side broadcast (the common case:
    polygon dimension << points fact table). With it off, Catalyst picks a
    shuffle join and AQE handles skewed hot cells; passing ``hot_cells``
    additionally salts those cells explicitly (plans/skew.py).
    """
    spark = points.sparkSession
    if covers is None:
        covers = parcel_covers(parcels, res=res, compact=compact)
    if broadcast_cover:
        covers = F.broadcast(covers)

    pts = points.withColumn("_cell", cell_of(F.col(lon), F.col(lat), res))
    if hot_cells and not compact:
        from demeter_spark.plans.skew import salted_cover_join

        cand = salted_cover_join(pts, covers, hot_cells, n_salt=n_salt)
    elif compact:
        res_min = 0
        pts = pts.withColumn(
            "_anc", ancestors_of(F.col("_cell"), res_min)
        ).withColumn("_jcell", F.explode("_anc")).drop("_anc")
        cand = pts.join(covers, pts["_jcell"] == covers["cell"], "inner").drop(
            "cell", "_jcell"
        )
    else:
        cand = pts.join(covers, pts["_cell"] == covers["cell"], "inner").drop("cell")

    # filter-refine fast path, single pass: candidates in fully-interior
    # cover cells are exact matches (no boundary can cross them); only
    # boundary-cell candidates run the vectorized PIP kernel. One boolean
    # pandas UDF over FOUR narrow columns — the upstream join executes once
    # (no branch-and-union recompute) and wide row payloads (urls, html)
    # never cross the Arrow boundary.
    polys = {
        int(r["parcel_id"]): geom.parse_wkt_polygons(r["geom_wkt"])
        for r in parcels.select("parcel_id", "geom_wkt").collect()
    }
    bc = spark.sparkContext.broadcast(polys)

    @F.pandas_udf(BooleanType())
    def _keep(
        plon: pd.Series, plat: pd.Series, pid: pd.Series, full: pd.Series
    ) -> pd.Series:
        ok = full.to_numpy(dtype=bool).copy()
        need = ~ok
        if need.any():
            ok[need] = geom.points_in_polygons_grouped(
                plon.to_numpy()[need],
                plat.to_numpy()[need],
                pid.to_numpy()[need],
                bc.value,
            )
        return pd.Series(ok)

    return cand.filter(
        _keep(F.col(lon), F.col(lat), F.col("parcel_id"), F.col("full"))
    ).drop("_cell", "full")


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
    from pyspark.sql import Window

    from demeter_spark.functions.spark_udfs import kring_of

    lat_sz = 180.0 / (1 << res)
    site_cells = F.broadcast(
        sites.withColumn("_scell", cell_of(F.col("lon"), F.col("lat"), res)).select(
            F.col(site_id).alias("_sid"),
            F.col("lon").alias("_slon"),
            F.col("lat").alias("_slat"),
            "_scell",
        )
    )
    pts = points.select(
        id_col, F.col("lon").alias("_plon"), F.col("lat").alias("_plat")
    ).withColumn("_pcell", cell_of(F.col("_plon"), F.col("_plat"), res))

    # products, not pow(): Math.pow is only 1-ulp-accurate, products are
    # exact IEEE ops — keeps distances bit-identical to the SQL oracle
    dx = F.col("_plon") - F.col("_slon")
    dy = F.col("_plat") - F.col("_slat")
    dist = F.sqrt(dx * dx + dy * dy)
    w = Window.partitionBy(id_col).orderBy("_dist", "_sid")

    # phase 1: one k-ring candidate pass. A point is final iff its kth
    # candidate lies within ring_radius (anything outside the ring is
    # strictly farther than ring_radius, so the top-k cannot change).
    r = max(1, min(max_ring, 2))
    ranked = (
        pts.withColumn("_ring", F.explode(kring_of(F.col("_pcell"), r)))
        .join(site_cells, F.col("_ring") == F.col("_scell"), "inner")
        .dropDuplicates([id_col, "_sid"])
        .withColumn("_dist", dist)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    kth_ok = (
        ranked.groupBy(id_col)
        .agg(F.max("_rk").alias("_nk"), F.max("_dist").alias("_kth"))
        .filter((F.col("_nk") == k) & (F.col("_kth") <= r * lat_sz))
        .select(id_col)
    )
    resolved = ranked.join(F.broadcast(kth_ok), id_col, "left_semi")

    # phase 2: brute-force fallback for the (rare) unresolved stragglers —
    # exact, and bounded: stragglers are points in sparse regions only.
    rest = pts.join(F.broadcast(kth_ok), id_col, "left_anti")
    rest_ranked = (
        rest.crossJoin(site_cells)
        .withColumn("_dist", dist)
        .withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
    )
    final_cols = [
        F.col(id_col),
        F.col("_sid").alias(site_id),
        F.col("_rk").alias("rank"),
        F.col("_dist").alias("dist"),
    ]
    return resolved.select(*final_cols).unionByName(rest_ranked.select(*final_cols))
