"""Scattered-point -> grid interpolation (IDW / nearest / moving average).

The classic geospatial gridding stage: turn an irregular observation set
(gauges, soundings, samples) into a regular cell grid. The reference
engine CONSUMES pre-gridded rasters (POLARIS/SLGA tiles,
/root/reference/demeter/raster/__init__.py) — this computes the grid from
points, closing the loop with the raster operators (zonal, terrain,
hydrology all take the produced grid).

Method: Shepard inverse-distance weighting (public classic, Shepard 1968)
over the k nearest sites per node, with the nearest/Voronoi grid as the
k=1 degenerate case and an unweighted moving average as power=0.

Scale shape: the node<->site neighbor search is the existing k-ring
doubling join (operators/joins.knn_join — one shuffle per doubling level,
bounded brute residue), so interpolation inherits its 100 TB posture; the
blend itself is ONE sorted fold per node (k-bounded array, no extra
shuffle beyond the kNN's own groupBy).

Determinism: neighbor contributions are folded in (rank, site_id) order
via sort_array + aggregate, so the floating sum has ONE evaluation order
regardless of partitioning/shuffle arrival — bit-stable across runs and
engines. Exact-hit nodes (distance 0) take the coincident site's value
directly (min site_id on ties), the standard IDW singularity rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demeter_spark.operators.joins import knn_join


def grid_nodes(
    spark,
    lon_min: float,
    lat_min: float,
    nx: int,
    ny: int,
    cell: float,
    n_partitions: int | None = None,
) -> DataFrame:
    """Regular grid of cell-center nodes: (node_id, ix, iy, lon, lat).

    Node coordinates are centers (origin + (i + 0.5) * cell), matching the
    cell-grid convention of the raster operators so the produced surface
    joins cell-for-cell with rasters on the same transform.
    """
    rng = (
        spark.range(0, nx * ny, 1, n_partitions)
        if n_partitions
        else spark.range(0, nx * ny)
    )
    return rng.selectExpr(
        "id AS node_id",
        f"CAST(id % {nx} AS INT) AS ix",
        f"CAST(id div {nx} AS INT) AS iy",
        f"{lon_min!r} + (CAST(id % {nx} AS DOUBLE) + 0.5e0) * {cell!r} AS lon",
        f"{lat_min!r} + (CAST(id div {nx} AS DOUBLE) + 0.5e0) * {cell!r} AS lat",
    )


def idw(
    nodes: DataFrame,
    sites: DataFrame,
    k: int = 8,
    power: int = 2,
    res: int = 9,
    node_id: str = "node_id",
    site_id: str = "site_id",
    value_col: str = "value",
) -> DataFrame:
    """IDW surface: one row per node with ``value`` blended from its k
    nearest sites — weights 1/d^power (integer power; 0 = plain moving
    average, the d*d product form keeps p=2 exact-IEEE like the kNN
    distance itself).

    Returns (node_id, value, n_sites, min_dist). Nodes are dropped only if
    the site table is empty.
    """
    if power < 0:
        raise ValueError("power must be a non-negative integer")
    nn = knn_join(
        nodes, sites, k=k, res=res, id_col=node_id, site_id=site_id
    ).join(sites.select(site_id, F.col(value_col).alias("_v")), site_id)

    # fold neighbors in (rank, site_id) order: one deterministic float
    # evaluation order per node, independent of shuffle arrival
    agg = (
        nn.groupBy(node_id)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("rank"),
                        F.col(site_id),
                        F.col("dist"),
                        F.col("_v"),
                    )
                )
            ).alias("nbrs")
        )
        .withColumn("n_sites", F.size("nbrs").cast("int"))
        .withColumn("min_dist", F.element_at(F.col("nbrs"), 1)["dist"])
    )
    exact = "filter(nbrs, x -> x.dist = 0e0)"
    # even powers <= 4 as exact-IEEE products (matches the kNN distance
    # discipline); other powers via power() — 1-ulp, documented
    weight = {
        0: "1.0e0",
        2: "1.0e0 / (x.dist * x.dist)",
        4: "1.0e0 / ((x.dist * x.dist) * (x.dist * x.dist))",
    }.get(power, f"1.0e0 / power(x.dist, {power}e0)")
    num = f"aggregate(nbrs, 0.0e0, (a, x) -> a + x._v * ({weight}))"
    den = f"aggregate(nbrs, 0.0e0, (a, x) -> a + ({weight}))"
    return agg.selectExpr(
        node_id,
        # single neighbor (k=1 / Voronoi): the site value EXACTLY —
        # (v*w)/w is not an IEEE identity, so the blend path would
        # perturb the last ulp for no reason
        f"CASE WHEN size({exact}) > 0 THEN element_at({exact}, 1)._v"
        " WHEN size(nbrs) = 1 THEN element_at(nbrs, 1)._v"
        f" ELSE ({num}) / ({den}) END AS value",
        "n_sites",
        "min_dist",
    )


def idw_grid(
    spark,
    sites: DataFrame,
    lon_min: float,
    lat_min: float,
    nx: int,
    ny: int,
    cell: float,
    k: int = 8,
    power: int = 2,
    res: int = 9,
    site_id: str = "site_id",
    value_col: str = "value",
) -> DataFrame:
    """Convenience composition: build the node grid and interpolate —
    output (node_id, ix, iy, lon, lat, value, n_sites, min_dist), ready to
    feed the raster operators (terrain, zonal, tile pyramid)."""
    nodes = grid_nodes(spark, lon_min, lat_min, nx, ny, cell)
    surf = idw(
        nodes,
        sites,
        k=k,
        power=power,
        res=res,
        site_id=site_id,
        value_col=value_col,
    )
    return nodes.join(surf, "node_id")
