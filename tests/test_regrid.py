"""Regrid (reproject/align analogue) and min-cover unit tests."""

import pytest

from pyspark.sql import functions as F

from demeter_spark.operators import regrid
from demeter_spark.sources import synth


def test_coarsen_then_refine_roundtrip_counts(spark):
    cells = synth.raster_cells(spark).filter(F.col("dataset") == "elevation")
    coarse = regrid.coarsen(cells, 4)
    assert coarse.count() == (synth.GRID_NX // 4) * (synth.GRID_NY // 4)
    fine = regrid.refine_nearest(
        cells.select("dataset", "ix", "iy", "value"), 2
    )
    assert fine.count() == cells.count() * 4
    # nearest-refine preserves the per-dataset mean exactly (each value x4) —
    # the reference's reprojection invariant (test_reprojection.py:19-101)
    m0 = cells.agg(F.avg("value")).first()[0]
    m1 = fine.agg(F.avg("value")).first()[0]
    assert abs(m0 - m1) < 1e-12


def test_align_check_flags_misaligned(spark):
    tiles = synth.raster_tiles(spark)
    ok = regrid.align_check(tiles)
    assert ok.filter(F.col("n_grids") > 1).count() == 0
    # shift one tile's origin off-grid -> flagged
    bad = tiles.withColumn(
        "tile_x",
        F.when(F.col("tile_x") == 0, F.lit(0)).otherwise(F.col("tile_x")),
    ).withColumn(
        "res",
        F.when(
            (F.col("tile_x") == 0) & (F.col("dataset") == "elevation"),
            F.lit(0.3),
        ).otherwise(F.col("res")),
    )
    flagged = regrid.align_check(bad).filter(F.col("n_grids") > 1)
    assert flagged.count() == 1


def test_snap_bounds(spark):
    b = spark.createDataFrame(
        [(0.3, 0.1, 1.9, 2.0)], "xmin DOUBLE, ymin DOUBLE, xmax DOUBLE, ymax DOUBLE"
    )
    out = regrid.snap_bounds(b, 0.5).first()
    assert (out["xmin"], out["ymin"], out["xmax"], out["ymax"]) == (0.0, 0.0, 2.0, 2.0)


def test_greedy_min_cover():
    tiles = {
        1: {1, 2, 3, 4},
        2: {3, 4, 5, 6},
        3: {5, 6},
        4: {7},
    }
    assert regrid.greedy_min_cover(tiles, {1, 2, 3, 4, 5, 6, 7}) == [1, 2, 4]
    assert regrid.greedy_min_cover(tiles, {5, 6}) == [2]
    with pytest.raises(ValueError):
        regrid.greedy_min_cover(tiles, {99})


def test_media_decode_plumbing(spark):
    from demeter_spark.sources import multimodal

    med = multimodal.media(spark, "/root/testdata/sf0.001")
    feats = multimodal.decode_features(med)
    row = feats.filter(F.col("doc_id") == 7).first()
    assert row["width"] == 7 % 64 + 1 and row["height"] == 7 % 48 + 1
    assert row["kind"] == "audio"
    # decode_real is a REAL bitstream decoder now (PNG/WAV,
    # functions/codecs.py); the fake 'IMG|' format is not a supported codec
    # and must fail loudly at execution
    with pytest.raises(Exception, match="NotImplementedError|external libraries"):
        multimodal.decode_real(med).collect()

def test_coarsen_negative_indices_floor(spark):
    """Floor (not trunc-toward-zero) parent indexing: cells at ix=-1 and ix=0
    belong to different factor-4 parent blocks."""
    from demeter_spark.operators.regrid import coarsen

    df = spark.createDataFrame(
        [("d", -1, -1, 1.0), ("d", 0, 0, 3.0), ("d", -4, -4, 5.0)],
        "dataset STRING, ix BIGINT, iy BIGINT, value DOUBLE",
    )
    got = {
        (r["ix"], r["iy"]): r["mean_value"]
        for r in coarsen(df, 4).collect()
    }
    assert got == {(-1, -1): 3.0, (0, 0): 3.0}
