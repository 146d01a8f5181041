"""The SSURGO-equivalent relational pipeline, re-expressed as DataFrame ops.

Capability parity (SURVEY.md §3.2): the reference composes three T-SQL stages
shipped to USDA's Soil Data Access (demeter/vector/usda/ssurgo.py:20-108) and
finishes with local pandas aggregation (ssurgo.py:231-305). Here the whole
lifecycle is one Catalyst plan:

- primary components: filter majcompflag='Yes', then TOP 1 WITH TIES per map
  unit — ``rank()`` (NOT row_number: ties are kept, ssurgo.py:43-57 /
  SURVEY.md §7.3 hard part 3);
- horizons: left-semi key propagation (ssurgo.py:154-157) + interval-overlap
  range predicate ``bottom > :top AND top < :bottom`` (ssurgo.py:87-89);
- fragments: group sum + sorted-unique concat (ssurgo.py:231-238, 259-265);
- depth-weighted average with the reference's exact null semantics
  (ssurgo.py:270-301): clipped-overlap weights, NULL values excluded from
  numerator AND denominator, all-NULL -> NULL.

Small dimension tables broadcast; everything else is partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def primary_components(components: DataFrame) -> DataFrame:
    """Top component(s) by comppct per parcel among major components (A2/W2).

    Intentional semantic deviation from the reference: demeter's query is
    ``SELECT TOP 1 ... ORDER BY comppct_r DESC`` per map unit
    (demeter/vector/usda/ssurgo.py:43-57), which returns exactly ONE
    component with ties broken arbitrarily by the remote engine. Arbitrary
    tie-breaks are not reproducible across engines/runs, so this engine uses
    ``rank()`` and keeps all tied components — a deterministic superset of
    every answer the reference could return. (A row_number() variant would
    mirror the single-row shape but would have to invent a tiebreak column
    the reference doesn't specify.)
    """
    w = Window.partitionBy("parcel_id").orderBy(F.desc("comppct"))
    return (
        components.filter(F.col("majcompflag") == "Yes")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .drop("rnk")
    )


def horizons_in_range(
    horizons: DataFrame, component_keys: DataFrame, top: int, bottom: int
) -> DataFrame:
    """Key-propagation semi join (J11) + interval-overlap predicate (P3/J10)."""
    return horizons.join(
        F.broadcast(component_keys.select("component_key").distinct()),
        "component_key",
        "left_semi",
    ).filter(
        (F.col("bottom_depth_cm") > F.lit(top))
        & (F.col("top_depth_cm") < F.lit(bottom))
    )


def fragment_summary(fragments: DataFrame, horizon_keys: DataFrame) -> DataFrame:
    """Per-horizon fragment volume + sorted-unique kinds (A3/A4/A6)."""
    return (
        fragments.join(
            F.broadcast(horizon_keys.select("horizon_key").distinct()),
            "horizon_key",
            "left_semi",
        )
        .groupBy("horizon_key")
        .agg(
            F.sum("fragment_pct").alias("total_fragment_pct"),
            F.array_join(
                F.array_sort(F.collect_set("fragment_kind")), ", "
            ).alias("fragment_kinds"),
        )
    )


def depth_weighted_properties(
    horizons: DataFrame,
    top: int,
    bottom: int,
    properties: tuple[str, ...] = ("sand", "clay", "om"),
) -> DataFrame:
    """Null-aware depth-weighted average per component (A5, ssurgo.py:270-301)."""
    w = (
        F.least(F.lit(bottom), F.col("bottom_depth_cm"))
        - F.greatest(F.lit(top), F.col("top_depth_cm"))
    ).cast("double")
    df = horizons.withColumn("_w", w)
    aggs = []
    for p in properties:
        v = F.col(p)
        aggs.append(
            (F.sum(v * F.col("_w")) / F.sum(F.when(v.isNotNull(), F.col("_w"))))
            .alias(f"{p}_dw")
        )
    return df.groupBy("component_key").agg(*aggs)


def primary_soil_components(
    parcels: DataFrame,
    components: DataFrame,
    horizons: DataFrame,
    fragments: DataFrame,
    top: int = 0,
    bottom: int = 50,
) -> DataFrame:
    """Full pipeline: one row per (parcel, primary component) — ties kept —
    with depth-weighted soil properties and fragment summaries, ordered by
    parcel_id (O1, ssurgo.py:66-67)."""
    prim = primary_components(components)
    hz = horizons_in_range(horizons, prim, top, bottom)

    # per-component fragment rollup (ssurgo.py:231-238, 259-265): volume sum
    # + sorted-unique kinds across the component's in-range horizons
    hz_keys = hz.select("horizon_key", "component_key")
    comp_frag = (
        fragments.join(F.broadcast(hz_keys), "horizon_key")
        .groupBy("component_key")
        .agg(
            F.sum("fragment_pct").alias("total_fragment_pct"),
            F.array_join(
                F.array_sort(F.collect_set("fragment_kind")), ", "
            ).alias("fragment_kinds"),
        )
    )
    props = depth_weighted_properties(hz, top, bottom)

    out = (
        prim.join(props, "component_key", "left")
        .join(comp_frag, "component_key", "left")
        .join(
            F.broadcast(parcels.select("parcel_id", "kind")), "parcel_id", "left"
        )
        .select(
            "parcel_id",
            "kind",
            "component_key",
            "compname",
            "comppct",
            "drainagecl",
            "sand_dw",
            "clay_dw",
            "om_dw",
            "total_fragment_pct",
            "fragment_kinds",
        )
        .orderBy("parcel_id", "component_key")
    )
    return out
