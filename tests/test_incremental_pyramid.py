"""Incremental tile pyramid over LineageLog: union == batch (exact ints),
idempotent replay, increment-bounded write work."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from demeter_spark.operators import tilepyramid as tp
from demeter_spark.plans.lineage import LineageLog

RES_MAX, RES_MIN = 7, 3
N = 3000


def _pts(spark, lo: int, hi: int):
    pdf = pd.DataFrame(
        {
            "lon": [-180.0 + (i * 11 % 2048) * (360.0 / 2048.0) for i in range(lo, hi)],
            "lat": [-90.0 + (i * 5 % 2048) * (180.0 / 2048.0) for i in range(lo, hi)],
            "v": [i * 17 % 101 for i in range(lo, hi)],
        }
    )
    return spark.createDataFrame(pdf)


def _tiles(df):
    return {
        (r.res, r.ix, r.iy): (r.n_points, r.sum_v, r.min_v, r.max_v)
        for r in df.collect()
    }


def test_union_equals_batch_and_replay_idempotent(spark, tmp_path):
    log = LineageLog(spark, str(tmp_path / "pyr_state"))
    bounds = [(0, 1000), (1000, 2200), (2200, N)]
    current = None
    for i, (lo, hi) in enumerate(bounds):
        current = tp.incremental_tile_pyramid(
            log, _pts(spark, lo, hi), i, RES_MAX, RES_MIN, value_col="v"
        )
    got = _tiles(current)
    want = _tiles(
        tp.tile_pyramid(
            _pts(spark, 0, N), RES_MAX, RES_MIN, value_col="v"
        )
    )
    assert got == want

    # crash recovery: replaying the LATEST increment is a no-op (its
    # partitions are already committed under the same fingerprint)
    replay = tp.incremental_tile_pyramid(
        log, _pts(spark, *bounds[-1]), len(bounds) - 1, RES_MAX, RES_MIN,
        value_col="v",
    )
    assert _tiles(replay) == want


def test_increments_own_disjoint_partitions(spark, tmp_path):
    """Each increment's write touches at most n_parts NEW partitions and
    never rewrites an earlier increment's state."""
    log = LineageLog(spark, str(tmp_path / "pyr_parts"))
    tp.incremental_tile_pyramid(log, _pts(spark, 0, 500), 0, RES_MAX, RES_MIN)
    parts0 = {
        int(r.part)
        for r in log.snapshots().where("stage = 'tile_pyramid_parts'").collect()
    }
    tp.incremental_tile_pyramid(log, _pts(spark, 500, 900), 1, RES_MAX, RES_MIN)
    parts1 = {
        int(r.part)
        for r in log.snapshots().where("stage = 'tile_pyramid_parts'").collect()
    } - parts0
    assert parts0 and parts1
    assert parts0.isdisjoint(parts1)
    assert all(p < 8 for p in parts0) and all(8 <= p < 16 for p in parts1)


def test_streaming_pyramid_equals_batch(spark, tmp_path):
    """Two file arrivals through the AvailableNow stream: the published
    snapshot equals the batch pyramid over all points; a third run with
    nothing new leaves it untouched."""
    from demeter_spark.streaming.incremental import streaming_tile_pyramid

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    _pts(spark, 0, 1200).write.mode("append").parquet(in_dir)
    streaming_tile_pyramid(
        spark, in_dir, out_dir, ckpt, state, RES_MAX, RES_MIN, value_col="v"
    )
    _pts(spark, 1200, N).write.mode("append").parquet(in_dir)
    streaming_tile_pyramid(
        spark, in_dir, out_dir, ckpt, state, RES_MAX, RES_MIN, value_col="v"
    )
    want = _tiles(
        tp.tile_pyramid(_pts(spark, 0, N), RES_MAX, RES_MIN, value_col="v")
    )
    assert _tiles(spark.read.parquet(out_dir)) == want
    streaming_tile_pyramid(
        spark, in_dir, out_dir, ckpt, state, RES_MAX, RES_MIN, value_col="v"
    )
    assert _tiles(spark.read.parquet(out_dir)) == want
