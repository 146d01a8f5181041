"""Tile/raster merge algebra: overlap-resolving aggregation over cell grids.

Capability parity (SURVEY.md §2.4 A10-A12, §2.9 R3): the reference merges N
rasters onto one grid resolving overlaps by first/min/max/sum/count/mean
(demeter/raster/utils/merge.py:50-97,165-232 — mean via the sum+count
two-band trick, merge.py:201-211,266-302), computes per-pixel variance/stddev
around a mean (merge.py:100-146), and warns when overlapping pixels disagree
(check_for_overlapping_pixels, merge.py:353-378).

Spark shape: a union of per-source cell rows, then one groupBy(ix, iy) —
Spark's partial+final hash aggregation IS the reference's sum+count trick.
``first`` is made deterministic by source priority (min_by), fixing the
reference's input-order dependence (SURVEY.md §7.3 hard part 4). Variance is
expanded to exact-sum form ((Σx² − (Σx)²/n)/n) so results are reproducible
bit-for-bit across engines and partitionings for integer-valued pixels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGE_METHODS = ("first", "last", "min", "max", "sum", "count", "mean", "var", "stddev")


def merge_cells(sources: DataFrame, keys: tuple[str, ...] = ("ix", "iy")) -> DataFrame:
    """Merge overlapping per-source cells into one grid, all methods at once.

    ``sources``: (source, priority, ix, iy, value) — NULL value = nodata.
    Output: one row per cell with every merge statistic.
    """
    gb = [F.col(k) for k in keys]
    return sources.groupBy(*gb).agg(
        F.expr(
            "min_by(value, priority) FILTER (WHERE value IS NOT NULL)"
        ).alias("first_value"),
        F.expr(
            "max_by(value, priority) FILTER (WHERE value IS NOT NULL)"
        ).alias("last_value"),
        F.expr("min(value)").alias("min_value"),
        F.expr("max(value)").alias("max_value"),
        F.expr("sum(value)").alias("sum_value"),
        F.expr("count(value)").alias("count_value"),
        F.expr("sum(value) / count(value)").alias("mean_value"),
        F.expr(
            "(sum(value*value) - sum(value)*sum(value)/count(value)) / count(value)"
        ).alias("var_value"),
        F.expr(
            "sqrt((sum(value*value) - sum(value)*sum(value)/count(value)) / count(value))"
        ).alias("stddev_value"),
    )


def overlap_conflicts(
    sources: DataFrame, keys: tuple[str, ...] = ("ix", "iy")
) -> DataFrame:
    """Cells where overlapping sources disagree (A12): the reference logs a
    warning and keeps the first pixel; here the conflict set is a first-class
    metrics output (fed to the lineage/metrics table)."""
    gb = [F.col(k) for k in keys]
    return (
        sources.filter(F.col("value").isNotNull())
        .groupBy(*gb)
        .agg(
            F.countDistinct("value").alias("n_distinct"),
            F.count("value").alias("n_sources"),
        )
        .filter(F.col("n_distinct") > 1)
    )


def merge_variance_around_mean(
    sources: DataFrame,
    mean_cells: DataFrame,
    keys: tuple[str, ...] = ("ix", "iy"),
) -> DataFrame:
    """Per-cell variance of N sources around a *given* mean raster
    (merge.py:100-128 _copy_variance_from_stacked_mean)."""
    j = sources.join(mean_cells.select(*keys, F.col("mean_value")), list(keys))
    d = F.col("value") - F.col("mean_value")
    return j.groupBy(*[F.col(k) for k in keys]).agg(
        (F.sum(d * d) / F.count(F.col("value"))).alias("var_around_mean")
    )
