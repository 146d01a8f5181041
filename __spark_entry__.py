"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline (geocode -> cell-cover join ->
exact PIP refine) at sf0.001. ``queries()``/``oracle_sql()`` expose each
implemented operator from SURVEY.md §2 with a DuckDB oracle over the
pre-registered testdata views (the synthetic spatial world is regenerated
inside the oracle SQL itself via closed-form CTEs — see
demeter_spark/sources/synth.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    sf_dir = "/root/testdata/sf0.001"
    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    return joins.spatial_join(pts, par, res=8).select(
        "url", "doc_id", "lon", "lat", "parcel_id"
    )


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1-style scan + byte-identical text extraction from html binary
    (BASELINE.json input_hint invariant)."""
    from demeter_spark.sources import synth

    return synth.pages(spark, sf_dir).selectExpr(
        "url", f"{synth.extract_text_expr('html')} AS text"
    )


def _q_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geocoding: regex place extraction + broadcast gazetteer join (S5/J2)."""
    from demeter_spark.sources import synth

    return synth.page_points(spark, sf_dir)


def _q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship J1: cell-cover equi-join + exact PIP refine."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    return joins.spatial_join(pts, par, res=8).select("url", "parcel_id")


def _q_spatial_join_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 with H3-style compacted covers + ancestor-chain point side."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    pts = synth.page_points(spark, sf_dir)
    par = synth.parcels(spark)
    return joins.spatial_join(pts, par, res=9, compact=True).select(
        "url", "parcel_id"
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J12: kNN via k-ring expansion (k=3 places per page, doc_id < 40)."""
    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    pts = synth.page_points(spark, sf_dir).filter(F.col("doc_id") < 40)
    gaz = synth.gazetteer(spark)
    return joins.knn_join(pts, gaz, k=3, res=6).select(
        "url", "place_id", F.col("rank").alias("rnk")
    )


def _q_lang_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-family smoke: groupBy count over the pages table."""
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    return (
        synth.pages(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n_pages"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "extract_text": _q_extract_text,
        "geocode_points": _q_geocode,
        "spatial_join": _q_spatial_join,
        "spatial_join_compact": _q_spatial_join_compact,
        "knn_kring": _q_knn,
        "lang_counts": _q_lang_counts,
    }


def oracle_sql() -> dict[str, str]:
    from demeter_spark.sources.synth import oracle_query

    return {
        "extract_text": oracle_query("SELECT url, text FROM pages", ("pages",)),
        "geocode_points": oracle_query("SELECT * FROM page_points"),
        "spatial_join": oracle_query(
            "SELECT url, parcel_id FROM point_parcel_truth"
        ),
        "spatial_join_compact": oracle_query(
            "SELECT url, parcel_id FROM point_parcel_truth"
        ),
        "knn_kring": oracle_query(
            """
            SELECT url, place_id, rnk FROM (
              SELECT pp.url, g.place_id,
                     row_number() OVER (
                       PARTITION BY pp.url
                       ORDER BY (pp.lon-g.lon)*(pp.lon-g.lon)
                              + (pp.lat-g.lat)*(pp.lat-g.lat), g.place_id
                     ) AS rnk
              FROM page_points pp, gazetteer g
              WHERE pp.doc_id < 40
            ) WHERE rnk <= 3
            """
        ),
        "lang_counts": oracle_query(
            "SELECT lang, CAST(count(*) AS BIGINT) AS n_pages FROM pages GROUP BY lang",
            ("pages",),
        ),
    }
