"""Cover-join + PIP refine must reproduce the closed-form containment truth
row-for-row (BASELINE.json north_rule: 'matching the reference's join output
rows and tile assignments')."""

import pytest

from demeter_spark.operators import joins
from demeter_spark.sources import synth
from tests.conftest import SF_DIR


def _truth(ddb):
    return set(
        map(
            tuple,
            ddb.sql(
                synth.oracle_query(
                    "SELECT url, parcel_id FROM point_parcel_truth"
                )
            ).fetchall(),
        )
    )


@pytest.mark.parametrize("compact,res", [(False, 7), (False, 9), (True, 9)])
def test_spatial_join_matches_truth(spark, ddb, compact, res):
    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    got = joins.spatial_join(pts, par, res=res, compact=compact)
    got_set = set(
        map(tuple, got.select("url", "parcel_id").distinct().collect())
    )
    assert got_set == _truth(ddb)


def test_spatial_join_shuffle_strategy(spark, ddb):
    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    got = joins.spatial_join(pts, par, res=8, broadcast_cover=False)
    got_set = set(map(tuple, got.select("url", "parcel_id").collect()))
    assert got_set == _truth(ddb)


def test_knn_join_matches_bruteforce(spark, ddb):
    pts = synth.page_points(spark, SF_DIR).limit(40)
    gaz = synth.gazetteer(spark)
    got = joins.knn_join(pts, gaz, k=3, res=6)
    got_rows = {
        (r["url"], r["place_id"], r["rank"]) for r in got.collect()
    }
    # brute-force oracle in DuckDB over the same synthetic world
    urls = [r["url"] for r in pts.select("url").collect()]
    url_list = ",".join(f"'{u}'" for u in urls)
    sql = synth.oracle_query(
        f"""
        SELECT url, place_id, rnk FROM (
          SELECT pp.url, g.place_id,
                 row_number() OVER (
                   PARTITION BY pp.url
                   ORDER BY (pp.lon-g.lon)*(pp.lon-g.lon)
                          + (pp.lat-g.lat)*(pp.lat-g.lat), g.place_id
                 ) AS rnk
          FROM page_points pp, gazetteer g
          WHERE pp.url IN ({url_list})
        ) WHERE rnk <= 3
        """
    )
    truth = set(map(tuple, ddb.sql(sql).fetchall()))
    assert got_rows == truth
