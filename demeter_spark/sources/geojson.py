"""GeoJSON ingestion (SURVEY.md §2.1 S5, §2.8 JSON scalars).

Capability parity with the reference's GeoJSON paths: it reads feature files
with geopandas (demeter/api.py:49-50) and posts/parses GeoJSON geometries to
the SSURGO SDA endpoint (demeter/vector/usda/ssurgo.py:133-134). Here the
decode is declarative Catalyst JSON: ``get_json_object`` pulls typed
fragments, ``from_json`` with a DECLARED nested-array schema parses the
coordinate arrays (no schema inference job), and WKT assembly is pure
higher-order array SQL — zero Python end to end, so a 10^12-row table of
GeoJSON strings parses inside whole-stage codegen.

Polygon + MultiPolygon cover the reference's fixtures; unknown geometry
types surface as NULL wkt (P11 geometry-type guard filters or fails them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

POLY_COORDS = "array<array<array<double>>>"
MPOLY_COORDS = "array<array<array<array<double>>>>"

# ring -> "(x y, x y, ...)" (CAST double->string is shortest round-trip repr)
_RING = (
    "concat('(', concat_ws(', ', transform({r}, pt ->"
    " concat(CAST(pt[0] AS STRING), ' ', CAST(pt[1] AS STRING)))), ')')"
)
# part (outer ring + holes) -> "((...), (...))"
_PART = (
    "concat('(', concat_ws(', ', transform({p}, r -> "
    + _RING.format(r="r")
    + ")), ')')"
)


def geometry_wkt(json_col: str):
    """GeoJSON feature string column -> parsing fragments (Polygon /
    MultiPolygon; NULL wkt for other types)."""
    gtype = F.get_json_object(F.col(json_col), "$.geometry.type")
    coords = F.get_json_object(F.col(json_col), "$.geometry.coordinates")
    poly = F.from_json(coords, POLY_COORDS)
    mpoly = F.from_json(coords, MPOLY_COORDS)
    poly_wkt = F.expr(f"concat('POLYGON ', {_PART.format(p='_poly')})")
    mpoly_wkt = F.expr(
        "concat('MULTIPOLYGON (', concat_ws(', ', transform(_mpoly, p -> "
        + _PART.format(p="p")
        + ")), ')')"
    )
    # the _poly/_mpoly intermediates are bound by the caller via with_wkt
    return (gtype, poly, mpoly, poly_wkt, mpoly_wkt)


def with_wkt(df: DataFrame, json_col: str = "feature") -> DataFrame:
    """Adds geom_type + geom_wkt columns parsed from a GeoJSON feature
    string column."""
    gtype, poly, mpoly, poly_wkt, mpoly_wkt = geometry_wkt(json_col)
    return (
        df.withColumn("geom_type", gtype)
        .withColumn("_poly", poly)
        .withColumn("_mpoly", mpoly)
        .withColumn(
            "geom_wkt",
            F.when(F.col("geom_type") == "Polygon", poly_wkt).when(
                F.col("geom_type") == "MultiPolygon", mpoly_wkt
            ),
        )
        .drop("_poly", "_mpoly")
    )


def features(
    df: DataFrame,
    json_col: str = "feature",
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parse a table of GeoJSON Feature strings: declared properties become
    typed columns (``{name: sql_type}``, extracted via $.properties.name),
    geometry becomes geom_type + geom_wkt."""
    out = with_wkt(df, json_col)
    for name, sql_type in (properties or {}).items():
        out = out.withColumn(
            name,
            F.get_json_object(F.col(json_col), f"$.properties.{name}").cast(
                sql_type
            ),
        )
    return out


def with_bbox(df: DataFrame, wkt_col: str = "geom_wkt") -> DataFrame:
    """Append (n_parts, xmin, ymin, xmax, ymax) parsed from WKT — the S6/P12
    bbox-derivation stage (vectorized numpy parse per Arrow batch)."""
    import pandas as pd

    from demeter_spark.functions import geom

    out_schema = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                           for f in df.schema.fields)
    out_schema += ", n_parts INT, xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE"

    def _bbox(batches):
        for pdf in batches:
            n, x0, y0, x1, y1 = [], [], [], [], []
            for w in pdf[wkt_col]:
                parts = geom.parse_wkt_polygons(w) if w is not None else []
                if not parts:
                    # NULL wkt (e.g. non-polygon geometry a caller chose to
                    # keep) -> NULL bbox, not an executor crash
                    n.append(0)
                    for acc in (x0, y0, x1, y1):
                        acc.append(None)
                    continue
                xs = [r[0] for p in parts for r in p[:1]]  # outer rings bound
                ys = [r[1] for p in parts for r in p[:1]]
                n.append(len(parts))
                x0.append(min(float(x.min()) for x in xs))
                y0.append(min(float(y.min()) for y in ys))
                x1.append(max(float(x.max()) for x in xs))
                y1.append(max(float(y.max()) for y in ys))
            yield pd.concat(
                [
                    pdf.reset_index(drop=True),
                    pd.DataFrame(
                        {"n_parts": n, "xmin": x0, "ymin": y0,
                         "xmax": x1, "ymax": y1}
                    ),
                ],
                axis=1,
            )

    return df.mapInPandas(_bbox, out_schema)


def assert_geometry_types(
    df: DataFrame, allowed: tuple[str, ...] = ("Polygon", "MultiPolygon"),
    type_col: str = "geom_type",
) -> DataFrame:
    """P11 geometry-type guard: fail the job at runtime if a row carries a
    geometry type outside ``allowed`` (raise_error is a Catalyst expression —
    the guard rides the existing scan, no extra pass)."""
    ok = F.col(type_col).isin(*allowed)
    guard = F.when(ok, F.col(type_col)).otherwise(
        F.raise_error(
            F.concat(F.lit("disallowed geometry type: "), F.col(type_col))
        )
    )
    return df.withColumn(type_col, guard)
