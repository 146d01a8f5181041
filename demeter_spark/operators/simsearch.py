"""Similarity search over embedding columns (array<float>).

Training-data-pipeline operators for the north rule's webtext payload:
- brute-force cosine top-k (the exactness baseline) — dot products via
  higher-order array expressions, fully JVM-side, no UDF;
- IVF-style partition-pruned top-k: search only the query's coarse cell
  (here the ``label`` column stands in for the IVF centroid assignment) —
  the 100 TB path: candidate set shrinks by the number of cells.

Top-k via window rank; scores are kept internal and only (query, neighbor,
rank) is emitted so results are stable across engines' float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "0D, (acc, v) -> acc + v)"
)
NORM = "sqrt(aggregate({a}, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "rnk")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against all of ``embeddings``."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    pairs = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(DOT.format(a="_qv", b="_cv"))
            / (
                F.expr(NORM.format(a="_qv")) * F.expr(NORM.format(a="_cv"))
            ),
        )
    )
    return _ranked(pairs, k)


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Partition-pruned top-k: candidates restricted to the query's cell.

    The scale path — the equi-join on ``cell_col`` replaces the cross join,
    so Catalyst shuffles by cell and each task scans one cell's vectors.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col(cell_col).alias("_cell"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.col(cell_col).alias("_cell"),
    )
    pairs = (
        q.join(c, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos",
            F.expr(DOT.format(a="_qv", b="_cv"))
            / (
                F.expr(NORM.format(a="_qv")) * F.expr(NORM.format(a="_cv"))
            ),
        )
    )
    return _ranked(pairs, k)
