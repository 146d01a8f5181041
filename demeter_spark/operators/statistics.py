"""Variance algebra for multi-layer soil statistics (SURVEY.md §2.4 A8/A9).

Capability parity with the reference's carbon-stock statistics
(demeter/utils.py:59-103, driven from polaris.py:139-157 / slga.py:118-137):

- A8: per-layer stddev recovered from the p5/p95 quantiles,
  sigma = (p5 - p95) / (2 * 1.645), then layers combined as a weighted
  average of VARIANCES with SQUARED weights (numpy.average semantics:
  normalize by sum(w^2)); sqrt back to a stddev;
- A9: variance of a product of independent variables,
  Var(XY) = Var(X)Var(Y) + Var(X)E(Y)^2 + Var(Y)E(X)^2 (the carbon-stock
  SOC x bulk-density combination), stddev = sqrt.

All pure Catalyst column expressions — no UDF, no shuffle beyond whatever
grouping the caller already has. Two layer-combination shapes:

- ``weighted_*_agg``: SUM-aggregate form for arbitrary/ragged layer sets
  (null layers drop from numerator and denominator, numpy.ma parity);
- fixed-order expression form (compose the column helpers over pivoted
  layer columns) when float results must be bit-reproducible across engines
  (aggregate sums are order-dependent in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANTILE_95 = 1.645  # demeter/utils.py:92


def stddev_from_p5_p95(p5: Column, p95: Column) -> Column:
    """A8 per-layer stddev: (p5 - p95) / (2 * 1.645) — sign mirrors the
    reference (it squares immediately, so only magnitude matters)."""
    return (p5 - p95) / F.lit(2 * QUANTILE_95)


def variance_from_p5_p95(p5: Column, p95: Column) -> Column:
    s = stddev_from_p5_p95(p5, p95)
    return s * s


def carbon_stock_mean(x_mean: Column, y_mean: Column) -> Column:
    return x_mean * y_mean


def carbon_stock_stddev(
    x_mean: Column, x_stddev: Column, y_mean: Column, y_stddev: Column
) -> Column:
    """A9: sqrt(Var(X)Var(Y) + Var(X)E(Y)^2 + Var(Y)E(X)^2) — term order
    matches demeter/utils.py:74-79 exactly."""
    vx = x_stddev * x_stddev
    vy = y_stddev * y_stddev
    return F.sqrt(vx * vy + vx * (y_mean * y_mean) + vy * (x_mean * x_mean))


def weighted_mean_agg(value: Column, weight: Column) -> Column:
    """numpy.average parity: sum(v*w)/sum(w), null values leave both sides."""
    return F.sum(value * weight) / F.sum(F.when(value.isNotNull(), weight))


def weighted_variance_agg(variance: Column, weight: Column) -> Column:
    """A8 layer combine: weighted average of variances with SQUARED weights
    (numpy.average(..., weights=w**2) normalizes by sum(w^2))."""
    w2 = weight * weight
    return F.sum(variance * w2) / F.sum(F.when(variance.isNotNull(), w2))


def layered_carbon_stock(
    layers: DataFrame,
    keys: tuple[str, ...] = ("ix", "iy"),
    weight_col: str = "thickness",
    soc: tuple[str, str, str] = ("soc_mean", "soc_p5", "soc_p95"),
    bd: tuple[str, str, str] = ("bd_mean", "bd_p5", "bd_p95"),
) -> DataFrame:
    """End-to-end A8+A9 over a (key, layer) table: depth-weighted SOC and
    bulk-density means, squared-weight variance combination per variable,
    then the product-variance carbon-stock stats per key.

    SUM-aggregate form — one hash aggregate, ragged/missing layers handled
    null-aware. For bit-reproducible cross-engine output pivot the layers
    and use the column helpers in a fixed-order expression instead (see
    __spark_entry__._q_carbon_stock)."""
    sm, s5, s95 = (F.col(c) for c in soc)
    bm, b5, b95 = (F.col(c) for c in bd)
    w = F.col(weight_col)
    agg = layers.groupBy(*[F.col(k) for k in keys]).agg(
        weighted_mean_agg(sm, w).alias("_socm"),
        weighted_variance_agg(variance_from_p5_p95(s5, s95), w).alias("_socv"),
        weighted_mean_agg(bm, w).alias("_bdm"),
        weighted_variance_agg(variance_from_p5_p95(b5, b95), w).alias("_bdv"),
    )
    return agg.select(
        *keys,
        carbon_stock_mean(F.col("_socm"), F.col("_bdm")).alias("stock_mean"),
        carbon_stock_stddev(
            F.col("_socm"),
            F.sqrt(F.col("_socv")),
            F.col("_bdm"),
            F.sqrt(F.col("_bdv")),
        ).alias("stock_stddev"),
    )
