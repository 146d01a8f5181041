"""D8 flow direction / watershed labeling / two-level flow accumulation —
verified against an independent sequential numpy reference and (for the
integer-exact direction assignment) a DuckDB oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demeter_spark.operators import hydrology


# ------------------------------------------------- sequential reference


def _ref_d8(grid: np.ndarray):
    """(H, W) int grid -> dict (ix, iy) -> (code, down) for interior cells.
    ix = column, iy = row index with iy increasing northward (row 0 =
    south edge)."""
    H, W = grid.shape
    out = {}
    for iy in range(1, H - 1):
        for ix in range(1, W - 1):
            v = int(grid[iy, ix])
            best = None  # (key, code, dx, dy)
            for dx, dy, code, w in hydrology.D8_OFFSETS:
                nv = int(grid[iy + dy, ix + dx])
                d = v - nv
                if d <= 0:
                    continue
                key = w * d * d
                if best is None or key > best[0] or (key == best[0] and code < best[1]):
                    best = (key, code, dx, dy)
            if best is None:
                out[(ix, iy)] = (0, None)
            else:
                out[(ix, iy)] = (best[1], (ix + best[2], iy + best[3]))
    return out


def _ref_acc_and_sink(d8: dict):
    """Sequential accumulation + terminal sink over the reference flow."""
    acc = {c: 1 for c in d8}
    # topological: repeatedly push from cells whose upstreams are all done
    indeg = {c: 0 for c in d8}
    for c, (_, down) in d8.items():
        if down is not None and down in d8:
            indeg[down] += 1
    stack = [c for c in d8 if indeg[c] == 0]
    order = []
    while stack:
        c = stack.pop()
        order.append(c)
        down = d8[c][1]
        if down is not None and down in d8:
            acc[down] += acc[c]
            indeg[down] -= 1
            if indeg[down] == 0:
                stack.append(down)
    sink = {}
    for c in d8:
        cur = c
        while d8[cur][1] is not None and d8[cur][1] in d8:
            cur = d8[cur][1]
        sink[c] = cur
    return acc, sink


def _cells_df(spark, grid: np.ndarray):
    H, W = grid.shape
    iy, ix = np.mgrid[0:H, 0:W]
    pdf = pd.DataFrame(
        {
            "ix": ix.ravel().astype(np.int64),
            "iy": iy.ravel().astype(np.int64),
            "v": grid.ravel().astype(np.int64),
        }
    )
    return spark.createDataFrame(pdf).repartition(8), pdf


def _grid(seed, H=18, W=22, hi=60):
    rng = np.random.default_rng(seed)
    return rng.integers(0, hi, (H, W)).astype(np.int64)


# ------------------------------------------------------------- d8_flow


def test_d8_flow_matches_reference_and_oracle(spark, ddb):
    grid = _grid(21)
    df, pdf = _cells_df(spark, grid)
    got = {
        (r["ix"], r["iy"]): (
            r["d8_code"],
            None if r["down_ix"] is None else (r["down_ix"], r["down_iy"]),
        )
        for r in hydrology.d8_flow(df).collect()
    }
    want = _ref_d8(grid)
    assert got == want
    # DuckDB oracle: same integer steepest-descent ranking in SQL
    ddb.register("dem_cells", pdf)
    offs = ", ".join(
        f"({dx}, {dy}, {code}, {w})" for dx, dy, code, w in hydrology.D8_OFFSETS
    )
    want_db = ddb.sql(
        f"""
        WITH offs(dx, dy, code, w) AS (VALUES {offs}),
        nb AS (
          SELECT c.ix, c.iy, c.v, o.code, o.dx, o.dy, o.w, n.v AS nv
          FROM dem_cells c CROSS JOIN offs o
          JOIN dem_cells n ON n.ix = c.ix + o.dx AND n.iy = c.iy + o.dy
        ),
        interior AS (
          SELECT ix, iy FROM nb GROUP BY ix, iy HAVING count(*) = 8
        ),
        ranked AS (
          SELECT ix, iy, code, dx, dy,
                 row_number() OVER (PARTITION BY ix, iy
                   ORDER BY w * (v - nv) * (v - nv) DESC, code ASC) AS rk
          FROM nb WHERE v > nv
        )
        SELECT i.ix, i.iy,
               coalesce(r.code, 0) AS d8_code,
               i.ix + r.dx AS down_ix, i.iy + r.dy AS down_iy
        FROM interior i LEFT JOIN ranked r
          ON r.ix = i.ix AND r.iy = i.iy AND r.rk = 1
        """
    ).df()
    db = {
        (int(r.ix), int(r.iy)): (
            int(r.d8_code),
            None if pd.isna(r.down_ix) else (int(r.down_ix), int(r.down_iy)),
        )
        for r in want_db.itertuples()
    }
    assert got == db


def test_d8_flow_single_exchange(spark):
    df, _ = _cells_df(spark, _grid(22, H=8, W=8))
    import re

    plan = (
        hydrology.d8_flow(df)._jdf.queryExecution().executedPlan().toString()
    )
    shuffles = re.findall(r"(?<!Broadcast)Exchange", plan)
    assert len(shuffles) <= 2  # input repartition + the stencil groupBy


def test_d8_pit_and_tie_semantics(spark):
    # a bowl: center is a pit; plateau ties break toward E (code 1)
    grid = np.full((5, 5), 9, dtype=np.int64)
    grid[2, 2] = 1  # pit
    df, _ = _cells_df(spark, grid)
    got = {
        (r["ix"], r["iy"]): r["d8_code"]
        for r in hydrology.d8_flow(df).collect()
    }
    assert got[(2, 2)] == 0  # pit: no descent
    # neighbors of the pit flow into it; (1, 2) is W of pit -> E code 1
    assert got[(1, 2)] == 1
    assert got[(3, 2)] == 16  # E of pit flows W
    # (1,1)'s only descent is the diagonal NE into the pit: code 128
    assert got[(1, 1)] == 128


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 10_000))
def test_d8_reference_tie_rule_is_total(seed):
    # the reference itself: every interior cell gets exactly one code
    grid = _grid(seed, H=8, W=9, hi=6)  # small range -> many ties
    want = _ref_d8(grid)
    assert len(want) == 6 * 7


# --------------------------------------------------------- accumulation


@pytest.mark.parametrize("tile_b", [4, 64])
def test_flow_accumulation_matches_reference(spark, tile_b):
    grid = _grid(31, H=20, W=24, hi=50)
    df, _ = _cells_df(spark, grid)
    flow = hydrology.d8_flow(df)
    got = {
        (r["ix"], r["iy"]): r["acc"]
        for r in hydrology.flow_accumulation(flow, tile_b=tile_b).collect()
    }
    want, _ = _ref_acc_and_sink(_ref_d8(grid))
    assert got == want


def test_flow_accumulation_ramp_river(spark):
    """A tilted plane drains east along rows: acc grows linearly; with
    tile_b=4 every path crosses many tile boundaries (stress the
    boundary-graph fixpoint)."""
    H, W = 8, 21
    iy, ix = np.mgrid[0:H, 0:W]
    grid = (1000 - 10 * ix).astype(np.int64)
    df, _ = _cells_df(spark, grid)
    flow = hydrology.d8_flow(df)
    got = {
        (r["ix"], r["iy"]): r["acc"]
        for r in hydrology.flow_accumulation(flow, tile_b=4).collect()
    }
    want, _ = _ref_acc_and_sink(_ref_d8(grid))
    assert got == want
    # interior row cells: acc = distance from west interior edge + 1
    for x in range(1, W - 1):
        assert got[(x, 3)] == x


def test_flow_accumulation_driver_solve_equals_loop(spark):
    """r07: the boundary fixpoint's driver topological solve (default when
    the boundary graph fits) must equal the distributed push loop
    (driver_solve_max=0) cell for cell."""
    grid = _grid(17, H=16, W=32, hi=60)
    df, _ = _cells_df(spark, grid)
    flow = hydrology.d8_flow(df).localCheckpoint(eager=True)
    fast = {
        (r["ix"], r["iy"]): r["acc"]
        for r in hydrology.flow_accumulation(flow, tile_b=4).collect()
    }
    loop = {
        (r["ix"], r["iy"]): r["acc"]
        for r in hydrology.flow_accumulation(
            flow, tile_b=4, driver_solve_max=0
        ).collect()
    }
    assert fast == loop and len(fast) > 0


# ------------------------------------------------------------ watershed


def test_watershed_label_matches_reference(spark):
    grid = _grid(41, H=16, W=16, hi=40)
    df, _ = _cells_df(spark, grid)
    flow = hydrology.d8_flow(df)
    got = {
        (r["ix"], r["iy"]): (r["sink_ix"], r["sink_iy"])
        for r in hydrology.watershed_label(flow).collect()
    }
    d8 = _ref_d8(grid)
    _, sink = _ref_acc_and_sink(d8)
    assert got == {c: s for c, s in sink.items()}
    # basin ids partition the grid: every cell in exactly one basin and
    # each basin's outlet is a pit or an edge-exiting cell
    for c, s in sink.items():
        code, down = d8[s]
        assert code == 0 or down not in d8
