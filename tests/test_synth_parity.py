"""The synthetic world must be bit-identical between Spark and DuckDB —
this is what makes the driver's oracle comparisons meaningful."""

import numpy as np
import pandas as pd
import pytest

from demeter_spark.sources import synth
from tests.conftest import SF_DIR


def _spark_pdf(df, sort_cols):
    return (
        df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    )


def _duck_pdf(ddb, sql, sort_cols):
    return ddb.sql(sql).df().sort_values(sort_cols).reset_index(drop=True)


def _compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    assert list(spark_pdf.columns) == list(duck_pdf.columns)
    assert len(spark_pdf) == len(duck_pdf)
    for c in spark_pdf.columns:
        a, b = spark_pdf[c], duck_pdf[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            an, bn = a.to_numpy(dtype=float), b.to_numpy(dtype=float)
            mask = ~(np.isnan(an) & np.isnan(bn))
            assert (an[mask] == bn[mask]).all(), f"column {c} differs"
        else:
            assert a.astype(str).equals(b.astype(str)), f"column {c} differs"


def test_gazetteer_parity(spark, ddb):
    s = _spark_pdf(synth.gazetteer(spark), ["place_id"])
    d = _duck_pdf(
        ddb, synth.oracle_query("SELECT * FROM gazetteer", ("gazetteer",)), ["place_id"]
    )
    _compare(s, d)


def test_pages_parity(spark, ddb):
    s = _spark_pdf(
        synth.pages(spark, SF_DIR).select("doc_id", "url", "warc_ts", "text", "lang"),
        ["doc_id"],
    )
    d = _duck_pdf(
        ddb,
        synth.oracle_query(
            "SELECT doc_id, url, warc_ts, text, lang FROM pages", ("pages",)
        ),
        ["doc_id"],
    )
    _compare(s, d)


def test_page_points_parity(spark, ddb):
    s = _spark_pdf(synth.page_points(spark, SF_DIR), ["doc_id"])
    d = _duck_pdf(
        ddb, synth.oracle_query("SELECT * FROM page_points"), ["doc_id"]
    )
    _compare(s, d)


def test_parcels_parity(spark, ddb):
    s = _spark_pdf(synth.parcels(spark).drop("kind", "geom_wkt"), ["parcel_id"])
    d = _duck_pdf(
        ddb,
        synth.oracle_query(
            "SELECT parcel_id, xmin, ymin, xmax, ymax, cx, cy, a, b FROM parcels",
            ("parcels",),
        ),
        ["parcel_id"],
    )
    _compare(s, d)


def test_raster_cells_parity(spark, ddb):
    s = _spark_pdf(
        synth.raster_cells(spark).select(
            "dataset", "depth_lo", "ix", "iy", "cx", "cy", "value"
        ),
        ["dataset", "depth_lo", "ix", "iy"],
    )
    d = _duck_pdf(
        ddb,
        synth.oracle_query(
            "SELECT dataset, depth_lo, ix, iy, cx, cy, value FROM raster_cells",
            ("raster_cells",),
        ),
        ["dataset", "depth_lo", "ix", "iy"],
    )
    _compare(s, d)


def test_soil_tables_parity(spark, ddb):
    for name, builder in (
        ("components", synth.components),
        ("horizons", synth.horizons),
        ("fragments", synth.fragments),
    ):
        key = {"components": "component_key", "horizons": "horizon_key",
               "fragments": "fragment_id"}[name]
        s = _spark_pdf(builder(spark), [key])
        d = _duck_pdf(ddb, synth.oracle_query(f"SELECT * FROM {name}", (name,)), [key])
        _compare(s, d)


def test_no_scaled_point_on_rect_boundary(spark):
    """The bench-scale replication must also avoid boundary-exact points
    (regression: jitter sums used to land exactly on 0.25-grid rect edges)."""
    from pyspark.sql import functions as F

    pts = synth.scaled_page_points(spark, SF_DIR, 50)
    par = synth.parcels(spark).collect()
    edges_x = [r["xmin"] for r in par] + [r["xmax"] for r in par]
    edges_y = [r["ymin"] for r in par] + [r["ymax"] for r in par]
    n = pts.filter(
        F.col("lon").isin(edges_x) | F.col("lat").isin(edges_y)
    ).count()
    assert n == 0


def test_no_point_on_parcel_boundary(spark):
    """Strict-vs-inclusive boundary semantics never matter: no synthetic point
    coordinate coincides with any parcel edge coordinate."""
    pts = synth.page_points(spark, SF_DIR).select("lon", "lat").toPandas()
    par = synth.parcels(spark).toPandas()
    edges_x = set(par["xmin"]) | set(par["xmax"]) | set(par["cx"].dropna())
    edges_y = set(par["ymin"]) | set(par["ymax"]) | set(par["cy"].dropna())
    assert not (pts["lon"].isin(list(edges_x))).any()
    assert not (pts["lat"].isin(list(edges_y))).any()
    # diamond boundary: |dx|*b + |dy|*a == a*b exactly never happens
    for _, d in par[par["kind"] == "diamond"].iterrows():
        v = (pts["lon"] - d.cx).abs() * d.b + (pts["lat"] - d.cy).abs() * d.a
        assert not (v == d.a * d.b).any()


def test_html_text_roundtrip_byte_identical(spark):
    """BASELINE.json input_hint: byte-identical extracted text per url."""
    from demeter_spark.sources.synth import extract_text_expr

    p = synth.pages(spark, SF_DIR)
    bad = p.selectExpr(
        "url", "text", f"{extract_text_expr('html')} AS extracted"
    ).filter("text != extracted OR text IS NULL")
    assert bad.count() == 0
