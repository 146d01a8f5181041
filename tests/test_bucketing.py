"""Bucketed co-located join must be exchange-free at query time."""

import pytest

from pyspark.sql import functions as F

from demeter_spark.functions.spark_udfs import cell_of
from demeter_spark.operators import joins
from demeter_spark.plans import bucketing
from demeter_spark.sources import synth
from tests.conftest import SF_DIR


def test_bucketed_cover_join_has_no_shuffle(spark, tmp_path):
    pts = synth.page_points(spark, SF_DIR).withColumn(
        "cell", cell_of(F.col("lon"), F.col("lat"), 8)
    )
    covers = joins.parcel_covers(synth.parcels(spark), res=8)

    bucketing.write_bucketed(pts, "pts_b", "cell", n_buckets=8)
    bucketing.write_bucketed(covers, "covers_b", "cell", n_buckets=8)

    joined = bucketing.colocated_join(spark, "pts_b", "covers_b", "cell")
    # disable broadcast so the join would normally shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and it still produces the right candidate multiset
        expected = (
            pts.join(covers, "cell").count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS pts_b")
        spark.sql("DROP TABLE IF EXISTS covers_b")


def test_cluster_sort_shape_and_order(spark):
    """O2: one range exchange + partition-local sort (no global sort), and
    rows arrive sorted within every partition."""
    from pyspark.sql import functions as F

    df = spark.range(10_000).selectExpr(
        "(id * 2654435761) % 1000 AS k", "id AS v"
    )
    cs = bucketing.cluster_sort(df, ("k",), ("v",))
    plan = cs._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(k" in plan, plan
    # the sort is partition-local (global=false encoded as Sort ... false)
    assert "Sort [k" in plan and ", false, 0" in plan, plan

    def _sorted_check(it):
        import pandas as pd

        for pdf in it:
            ok = (
                pdf.sort_values(["k", "v"]).reset_index(drop=True)["v"]
                == pdf.reset_index(drop=True)["v"]
            ).all()
            yield pd.DataFrame({"ok": [bool(ok)]})

    flags = cs.mapInPandas(_sorted_check, "ok BOOLEAN").collect()
    assert all(r["ok"] for r in flags)
