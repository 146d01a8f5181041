"""NDVI-style per-group raster kernel + cross-pass statistic merge.

Capability parity (SURVEY.md §3.3, X5, P10, R13, R14): the reference builds
NDVI per (crs, datatake) in ProcessPool tasks — merge bands, apply detector
footprint + cloud masks (SCL classes {3,8,9,10},
demeter/raster/sentinel2/ndvi.py:393-396 / sentinel2/constants.py:42-58),
scale reflectance /10000 (ndvi.py:447-453), compute (nir-red)/(nir+red)
(ndvi.py:456-457) — then merges per-datatake rasters into mean/min/max/stddev
statistic rasters (ndvi.py:289-313).

Spark shape: ``applyInPandas`` over (zone, datatake) groups runs the numpy
kernel (the process pool becomes ordinary task parallelism); a groupBy(zone,
cell) computes the statistic rasters. The SCL mask lives at half resolution
(20 m vs 10 m in the reference, ndvi.py:382-391) — the kernel maps each cell
to its parent mask cell (ix//2, iy//2), R14's parent-cell trick.

NDVI values are quantized to 1/1024 (floor) before merging so cross-pass
sums are exact dyadic arithmetic — bit-reproducible regardless of partition
order or engine (see SURVEY.md §7.3 determinism notes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CLOUD_CLASSES = (3, 8, 9, 10)


def ndvi_per_datatake(bands: DataFrame) -> DataFrame:
    """(zone, dt, ix, iy, red, nir) + coarse scl -> masked quantized NDVI.

    One applyInPandas task per (zone, dt) group — the reference's per-datatake
    ProcessPool task (ndvi.py:276-287) as a grouped-map kernel.
    """

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        red = pdf["red"].to_numpy(dtype=np.float64) / 10000.0
        nir = pdf["nir"].to_numpy(dtype=np.float64) / 10000.0
        scl = pdf["scl"].to_numpy()
        ndvi = (nir - red) / (nir + red)
        ndvi = np.floor(ndvi * 1024.0) / 1024.0
        masked = np.isin(scl, CLOUD_CLASSES)
        out = pdf[["zone", "dt", "ix", "iy"]].copy()
        vals = pd.array(ndvi, dtype="Float64")  # nullable: NA -> SQL NULL
        vals[masked] = pd.NA
        out["ndvi"] = vals
        return out

    return (
        bands.groupBy("zone", "dt")
        .applyInPandas(
            _kernel, "zone INT, dt INT, ix INT, iy INT, ndvi DOUBLE"
        )
    )


def ndvi_statistics(ndvi_cells: DataFrame) -> DataFrame:
    """Merge per-datatake NDVI rasters into per-cell statistic rasters
    (mean/min/max/stddev over passes), exact-sum variance form."""
    return ndvi_cells.groupBy("zone", "ix", "iy").agg(
        F.expr("count(ndvi)").alias("n_passes"),
        F.expr("sum(ndvi) / count(ndvi)").alias("ndvi_mean"),
        F.expr("min(ndvi)").alias("ndvi_min"),
        F.expr("max(ndvi)").alias("ndvi_max"),
        F.expr(
            "sqrt((sum(ndvi*ndvi) - sum(ndvi)*sum(ndvi)/count(ndvi)) / count(ndvi))"
        ).alias("ndvi_stddev"),
    )
