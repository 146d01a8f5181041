"""demeter_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-expresses the query/data-processing capabilities of useyardstick/demeter
(see SURVEY.md) as idiomatic Spark DataFrame pipelines:

- hierarchical cell index (H3/S2-style) computed in vectorized numpy inside
  Arrow pandas UDFs (``demeter_spark.functions.cellgrid``),
- cover-join (cell-id equi-join) + exact point-in-polygon refinement
  (``demeter_spark.operators.joins``),
- kNN via k-ring expansion, raster<->vector zonal stats, tile merge algebra,
- Common-Crawl-style pages ingestion with byte-identical text extraction,
- skew salting + AQE, per-partition lineage/metrics with resumable commits.

Everything here derives from public knowledge only: the Apache Spark API and
the reference repo's observable behavior.
"""

__version__ = "0.1.0"
