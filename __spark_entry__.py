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


def _q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: raster<->vector zonal stats — cells join parcels through the same
    cover-join + PIP machinery, then null-skipping aggregates (A15)."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth

    cells = synth.raster_cells(spark)
    par = synth.parcels(spark)
    return zonal.zonal_stats(cells, par)


def _q_zonal_depth_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A7: null-aware depth-weighted mean (om, 0-50 cm) per parcel."""
    from demeter_spark.operators import zonal
    from demeter_spark.sources import synth
    from pyspark.sql import functions as F

    cells = synth.raster_cells(spark).filter(F.col("dataset") == "om")
    par = synth.parcels(spark)
    joined = zonal.cells_in_parcels(cells, par)
    return zonal.depth_weighted_mean(joined, 0, 50)


def _q_tile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11/R3: overlap-resolving merge, all methods in one groupBy."""
    from demeter_spark.operators import tilemerge
    from demeter_spark.sources import synth

    return tilemerge.merge_cells(synth.merge_sources(spark))


def _q_merge_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: overlap-consistency check — disagreeing overlaps as metrics."""
    from demeter_spark.operators import tilemerge
    from demeter_spark.sources import synth

    return tilemerge.overlap_conflicts(synth.merge_sources(spark))


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
        "zonal_stats": _q_zonal_stats,
        "zonal_depth_weighted": _q_zonal_depth_weighted,
        "tile_merge": _q_tile_merge,
        "merge_conflicts": _q_merge_conflicts,
    }


_CONTAINS = """c.cx > pa.xmin AND c.cx < pa.xmax AND c.cy > pa.ymin AND c.cy < pa.ymax
         AND (pa.kind = 'rect'
              OR abs(c.cx - pa.cx) * pa.b + abs(c.cy - pa.cy) * pa.a < pa.a * pa.b)"""


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
        "zonal_stats": oracle_query(
            f"""
            SELECT pa.parcel_id, c.dataset, c.depth_lo,
                   CAST(count(c.value) AS BIGINT) AS n_valid,
                   avg(c.value) AS mean_value,
                   min(c.value) AS min_value,
                   max(c.value) AS max_value,
                   sum(c.value) AS sum_value
            FROM raster_cells c JOIN parcels pa ON {_CONTAINS}
            GROUP BY pa.parcel_id, c.dataset, c.depth_lo
            """,
            ("raster_cells", "parcels"),
        ),
        "zonal_depth_weighted": oracle_query(
            f"""
            SELECT parcel_id,
                   sum(value * w) / sum(CASE WHEN value IS NOT NULL THEN w END) AS dw_mean,
                   sum(CASE WHEN value IS NOT NULL THEN w END) AS w_valid
            FROM (
              SELECT pa.parcel_id, c.value,
                     CAST(greatest(0, least(50, c.depth_hi) - greatest(0, c.depth_lo)) AS DOUBLE) AS w
              FROM raster_cells c JOIN parcels pa ON {_CONTAINS}
              WHERE c.dataset = 'om'
            ) WHERE w > 0
            GROUP BY parcel_id
            """,
            ("raster_cells", "parcels"),
        ),
        "tile_merge": oracle_query(
            """
            SELECT ix, iy,
                   min_by(value, priority) FILTER (WHERE value IS NOT NULL) AS first_value,
                   max_by(value, priority) FILTER (WHERE value IS NOT NULL) AS last_value,
                   min(value) AS min_value,
                   max(value) AS max_value,
                   sum(value) AS sum_value,
                   CAST(count(value) AS BIGINT) AS count_value,
                   sum(value) / count(value) AS mean_value,
                   (sum(value*value) - sum(value)*sum(value)/count(value)) / count(value) AS var_value,
                   sqrt((sum(value*value) - sum(value)*sum(value)/count(value)) / count(value)) AS stddev_value
            FROM merge_sources GROUP BY ix, iy
            """,
            ("merge_sources",),
        ),
        "merge_conflicts": oracle_query(
            """
            SELECT ix, iy,
                   CAST(count(DISTINCT value) AS BIGINT) AS n_distinct,
                   CAST(count(value) AS BIGINT) AS n_sources
            FROM merge_sources WHERE value IS NOT NULL
            GROUP BY ix, iy HAVING count(DISTINCT value) > 1
            """,
            ("merge_sources",),
        ),
    }
