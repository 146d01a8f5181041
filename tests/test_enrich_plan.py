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


def _enriched(spark, **flags):
    return enrich.enrich_points(
        synth.page_points(spark, SF_DIR),
        synth.parcels(spark),
        synth.raster_cells(spark).filter(F.col("dataset") == "elevation"),
        synth.gazetteer(spark),
        synth.components(spark),
        synth.horizons(spark),
        **flags,
    )


def _join_lines(plan: str, key: str) -> list[str]:
    # physical-plan join nodes keyed on the given join key
    return [
        ln
        for ln in plan.splitlines()
        if re.search(r"(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)"
                     r".*" + re.escape(key), ln)
    ]


def _assert_strategy(spark, key: str, want_broadcast: bool, **flags) -> None:
    # pin the planner so the assertion tests OUR hint, not the tiny-input
    # auto-broadcast: with the threshold off and AQE off, only an explicit
    # hint can produce a BroadcastHashJoin
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _enriched(spark, **flags)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = _join_lines(plan, key)
        assert lines, plan
        if want_broadcast:
            assert any("BroadcastHashJoin" in ln for ln in lines), plan
        else:
            assert all("BroadcastHashJoin" not in ln for ln in lines), plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


@pytest.mark.parametrize("broadcast_elevation", [False, True])
def test_elevation_join_strategy(spark, broadcast_elevation):
    _assert_strategy(
        spark, "_ix", broadcast_elevation,
        broadcast_elevation=broadcast_elevation,
    )


@pytest.mark.parametrize("broadcast_soil", [False, True])
def test_soil_join_strategy(spark, broadcast_soil):
    # VERDICT r04 #2: the soil frame grows with the parcel dimension; its
    # broadcast must be opt-in, mirroring the elevation gate.
    _assert_strategy(
        spark, "parcel_id", broadcast_soil, broadcast_soil=broadcast_soil
    )
