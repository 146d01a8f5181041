"""enrich_points must NOT force-broadcast the elevation raster by default.

VERDICT r03 'What's wrong #3': a continental DEM is fact-sized; an
unconditional F.broadcast on it is a 100x-scale OOM. The default path must
leave the (_ix,_iy) equi-join strategy to the planner/AQE; the explicit
broadcast is opt-in for genuinely small rasters.
"""

import re

import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import enrich
from demeter_spark.sources import synth

from conftest import SF_DIR


def _enriched(spark, broadcast_elevation):
    return enrich.enrich_points(
        synth.page_points(spark, SF_DIR),
        synth.parcels(spark),
        synth.raster_cells(spark).filter(F.col("dataset") == "elevation"),
        synth.gazetteer(spark),
        synth.components(spark),
        synth.horizons(spark),
        broadcast_elevation=broadcast_elevation,
    )


def _ix_join_lines(plan: str) -> list[str]:
    # physical-plan join nodes keyed on the raster lookup key
    return [
        ln
        for ln in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
                     r".*_ix", ln)
    ]


@pytest.mark.parametrize("broadcast_elevation", [False, True])
def test_elevation_join_strategy(spark, broadcast_elevation):
    # pin the planner so the assertion tests OUR hint, not the tiny-input
    # auto-broadcast: with the threshold off and AQE off, only an explicit
    # hint can produce a BroadcastHashJoin
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _enriched(spark, broadcast_elevation)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = _ix_join_lines(plan)
        assert lines, plan
        if broadcast_elevation:
            assert any("BroadcastHashJoin" in ln for ln in lines), plan
        else:
            assert all("BroadcastHashJoin" not in ln for ln in lines), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
