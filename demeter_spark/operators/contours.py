"""Contour (isoline) extraction from cell grids — marching squares.

Capability extension of the reference's elevation stack (the DEMs it
fetches via demeter/raster/usgs/topography.py are exactly what contour
maps are drawn from; the reference consumes rasters but derives no vector
products). Marching squares is the public classic (Lorensen & Cline's
marching cubes in 2D); cases and saddle disambiguation by center average
follow the standard formulation.

Spark shape:
- every cell explodes into the <=4 2x2 corner blocks it participates in
  (map-side x4), ONE groupBy(bx, by) gathers the block's corners — the
  same single-Exchange stencil discipline as terrain.py / morphology.py;
- the 16-case segment table and the edge interpolation are pure Catalyst
  CASE/arithmetic — no UDF, whole-stage codegen end to end;
- only full blocks (all 4 corners present) emit, so grid edges and
  nodata holes truncate contours rather than inventing geometry.

Each emitted segment carries the GLOBAL grid-edge keys its endpoints lie
on (a crossing point belongs to exactly one lattice edge), which makes
segment linking an integer-key graph problem: ``contour_lines`` joins
segments on shared edge keys and labels connected polylines with the
existing min-label connected-components loop (dedup.py) — no float
coordinate matching anywhere.

Determinism/exactness: crossing positions are one subtraction-division
per endpoint, identical IEEE evaluation order in any engine; the test
reference recomputes them with the same expressions in numpy and matches
bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demeter_spark.operators.dedup import connected_components_contraction

__all__ = ["contour_segments", "contour_lines"]

# case -> list of (edge_a, edge_b) undirected segments; saddles (5, 10)
# resolved at runtime by the center-average rule
_CASE_SEGS = {
    1: [(0, 3)],
    2: [(0, 1)],
    3: [(1, 3)],
    4: [(1, 2)],
    6: [(0, 2)],
    7: [(2, 3)],
    8: [(2, 3)],
    9: [(0, 2)],
    11: [(1, 2)],
    12: [(1, 3)],
    13: [(0, 1)],
    14: [(0, 3)],
}
_SADDLE = {
    # case 5 (c0, c2 inside): center inside -> cut near c1 and c3
    (5, True): [(0, 1), (2, 3)],
    (5, False): [(0, 3), (1, 2)],
    # case 10 (c1, c3 inside): mirrored
    (10, True): [(0, 3), (1, 2)],
    (10, False): [(0, 1), (2, 3)],
}


def contour_segments(
    cells: DataFrame,
    level: float,
    ix_col: str = "ix",
    iy_col: str = "iy",
    value_col: str = "v",
) -> DataFrame:
    """Isoline segments at ``level``: one row per segment with endpoint
    coordinates in grid units and the lattice-edge keys they lie on.

    Columns: bx, by (block), seg_id (globally unique string), x1, y1,
    x2, y2 (crossing points; corner (i, j) sits at coordinate (i, j)),
    key1, key2 (lattice-edge keys, shared between touching segments).
    Inside = value >= level (NULL-valued cells break their blocks).
    """
    # gather the 4 corners of each 2x2 block: corner (ix, iy) is corner
    # (dx, dy) of block (ix - dx, iy - dy)
    contrib = cells.select(
        F.explode(
            F.expr(
                "transform(sequence(0, 3), o -> struct("
                "o % 2 AS dx, o div 2 AS dy))"
            )
        ).alias("_o"),
        F.col(ix_col).alias("_x"),
        F.col(iy_col).alias("_y"),
        F.col(value_col).cast("double").alias("_v"),
    ).select(
        (F.col("_x") - F.col("_o.dx")).alias("bx"),
        (F.col("_y") - F.col("_o.dy")).alias("by"),
        (F.col("_o.dx") + F.lit(2) * F.col("_o.dy")).alias("_c"),
        "_v",
    )
    blocks = (
        contrib.groupBy("bx", "by")
        .agg(
            *[
                F.max(F.when(F.col("_c") == c, F.col("_v"))).alias(f"v{c}")
                for c in range(4)
            ],
            F.sum(F.when(F.col("_v").isNotNull(), 1).otherwise(0)).alias("_n"),
        )
        .where(F.col("_n") == 4)
    )
    # corner layout: c0=(bx,by) c1=(bx+1,by) c2=(bx+1,by+1) c3=(bx,by+1)
    # (block corner index 2 from the gather is the TOP-LEFT (dx=0,dy=1) —
    # remap to the conventional CCW order used by the case table)
    lv = f"CAST({float(level)!r} AS DOUBLE)"  # bare 1.5 would parse DECIMAL
    b = blocks.selectExpr(
        "bx",
        "by",
        "v0",
        "v1 AS vb1",
        "v3 AS vb2",
        "v2 AS vb3",
    ).selectExpr(
        "bx",
        "by",
        "v0 AS c0",
        "vb1 AS c1",
        "vb2 AS c2",
        "vb3 AS c3",
        f"CAST(v0 >= {lv} AS INT) + 2 * CAST(vb1 >= {lv} AS INT)"
        f" + 4 * CAST(vb2 >= {lv} AS INT) + 8 * CAST(vb3 >= {lv} AS INT)"
        " AS cse",
        f"(v0 + vb1 + vb2 + vb3) / 4.0e0 >= {lv} AS center_in",
    )
    # crossing point + lattice-edge key per edge (NULL when not crossed)
    edge_defs = {
        0: (  # bottom: c0 -> c1
            f"CAST(bx AS DOUBLE) + ({lv} - c0) / (c1 - c0)",
            "CAST(by AS DOUBLE)",
            "concat('H:', bx, ':', by)",
        ),
        1: (  # right: c1 -> c2
            "CAST(bx + 1 AS DOUBLE)",
            f"CAST(by AS DOUBLE) + ({lv} - c1) / (c2 - c1)",
            "concat('V:', bx + 1, ':', by)",
        ),
        2: (  # top: c3 -> c2
            f"CAST(bx AS DOUBLE) + ({lv} - c3) / (c2 - c3)",
            "CAST(by + 1 AS DOUBLE)",
            "concat('H:', bx, ':', by + 1)",
        ),
        3: (  # left: c0 -> c3
            "CAST(bx AS DOUBLE)",
            f"CAST(by AS DOUBLE) + ({lv} - c0) / (c3 - c0)",
            "concat('V:', bx, ':', by)",
        ),
    }
    for e, (px, py, key) in edge_defs.items():
        b = b.withColumn(
            f"e{e}",
            F.expr(f"named_struct('px', {px}, 'py', {py}, 'key', {key})"),
        )

    def seg_array(segs):
        return F.array(
            *[
                F.struct(
                    F.col(f"e{a}").alias("a"), F.col(f"e{b_}").alias("b")
                )
                for a, b_ in segs
            ]
        )

    segs_col = F.lit(None).cast(
        "array<struct<a:struct<px:double,py:double,key:string>,"
        "b:struct<px:double,py:double,key:string>>>"
    )
    expr = None
    for cse, segs in _CASE_SEGS.items():
        cond = F.col("cse") == cse
        val = seg_array(segs)
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    for (cse, center), segs in _SADDLE.items():
        cond = (F.col("cse") == cse) & (
            F.col("center_in") if center else ~F.col("center_in")
        )
        expr = expr.when(cond, seg_array(segs))
    b = b.withColumn("_segs", expr.otherwise(segs_col))
    out = b.select(
        "bx",
        "by",
        F.posexplode("_segs").alias("_i", "_s"),
    ).selectExpr(
        "bx",
        "by",
        "concat(bx, ':', by, ':', _i) AS seg_id",
        "_s.a.px AS x1",
        "_s.a.py AS y1",
        "_s.b.px AS x2",
        "_s.b.py AS y2",
        "_s.a.key AS key1",
        "_s.b.key AS key2",
    )
    return out


def contour_lines(segments: DataFrame) -> DataFrame:
    """Link touching segments into polylines: adds ``line_id`` (the
    minimum seg_id of the connected set). Two segments touch iff they
    share a lattice-edge key — integer/string graph connectivity, no
    float matching. Labeling uses the CONTRACTION components variant
    (large-star/small-star, O(log^2 n) rounds): contour graphs are
    path/cycle shaped, so plain min-label propagation would need
    diameter-many rounds — one Spark job per contour segment."""
    ends = segments.select(
        "seg_id", F.explode(F.array("key1", "key2")).alias("k")
    )
    a, bb = ends.alias("a"), ends.alias("b")
    pairs = (
        a.join(bb, "k")
        .where(F.col("a.seg_id") < F.col("b.seg_id"))
        .select(
            F.col("a.seg_id").alias("seg_a"),
            F.col("b.seg_id").alias("seg_b"),
        )
        .distinct()
    )
    labels = connected_components_contraction(
        pairs,
        segments.select("seg_id"),
        id_col="seg_id",
        a_col="seg_a",
        b_col="seg_b",
    )
    return segments.join(
        labels.withColumnRenamed("cluster_id", "line_id"), "seg_id"
    )
