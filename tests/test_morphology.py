"""Grid morphology vs scipy-free numpy references (binary erosion/dilation
by explicit window scan), plus DuckDB oracle parity for the majority
filter and focal stats (all reductions order-independent integers)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import morphology as mor

NX, NY = 24, 16


def _mask_np(seed=3):
    rng = np.random.RandomState(seed)
    m = (rng.rand(NY, NX) > 0.55).astype(np.int64)
    m[5:8, 5:12] = 1  # a solid blob that must survive opening
    m[10, 20] = 1  # an isolated speck that must not
    return m


def _classes_np(seed=5):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 4, size=(NY, NX)).astype(np.int64)


# reference morphology on the unbounded plane Z^2 (set semantics — the
# operators treat the grid as sparse/unbounded, so dilation may emit
# outside the input extent and closing counts that as erosion support)


def _to_set(m):
    ys, xs = np.nonzero(m)
    return set(zip(ys.tolist(), xs.tolist()))


def _ref_erode_set(s, r):
    ball = [(dy, dx) for dy in range(-r, r + 1) for dx in range(-r, r + 1)]
    return {
        (y, x) for (y, x) in s if all((y + dy, x + dx) in s for dy, dx in ball)
    }


def _ref_dilate_set(s, r):
    return {
        (y + dy, x + dx)
        for (y, x) in s
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    }


def _set_to_np(s):
    out = np.zeros((NY, NX), dtype=np.int64)
    for y, x in s:
        if 0 <= y < NY and 0 <= x < NX:
            out[y, x] = 1
    return out


def _ref_erode(m, r):
    return _set_to_np(_ref_erode_set(_to_set(m), r))


def _ref_dilate(m, r):
    return _set_to_np(_ref_dilate_set(_to_set(m), r))


def _df_from(spark, arr, value_col):
    rows = [
        (int(x), int(y), int(arr[y, x]))
        for y in range(NY)
        for x in range(NX)
    ]
    return spark.createDataFrame(
        rows, f"ix int, iy int, {value_col} bigint"
    )


def _np_from(rows, value_col, fill=0):
    # the operators treat the grid as unbounded (dilation emits cells
    # outside the input extent); compare within the reference window
    out = np.full((NY, NX), fill, dtype=np.int64)
    for r in rows:
        if 0 <= r["iy"] < NY and 0 <= r["ix"] < NX:
            out[r["iy"], r["ix"]] = r[value_col]
    return out


@pytest.mark.parametrize("radius", [1, 2])
def test_erode_dilate_match_reference(spark, radius):
    m = _mask_np()
    df = _df_from(spark, m, "m")
    got_e = _np_from(mor.erode(df, radius).collect(), "m")
    got_d = _np_from(mor.dilate(df, radius).collect(), "m")
    assert (got_e == _ref_erode(m, radius)).all()
    assert (got_d == _ref_dilate(m, radius)).all()


def test_opening_removes_speck_keeps_blob(spark):
    m = np.zeros((NY, NX), dtype=np.int64)
    m[5:8, 5:12] = 1
    m[10, 20] = 1
    df = _df_from(spark, m, "m")
    got = _np_from(mor.opening(df, 1).collect(), "m")
    want = _set_to_np(_ref_dilate_set(_ref_erode_set(_to_set(m), 1), 1))
    assert (got == want).all()
    assert got[10, 20] == 0  # speck gone
    assert got[6, 8] == 1  # blob interior intact


def test_closing_fills_pinhole(spark):
    m = np.ones((NY, NX), dtype=np.int64)
    m[7, 9] = 0  # pinhole
    df = _df_from(spark, m, "m")
    got = _np_from(mor.closing(df, 1).collect(), "m")
    want = _set_to_np(_ref_erode_set(_ref_dilate_set(_to_set(m), 1), 1))
    assert (got == want).all()
    assert got[7, 9] == 1  # pinhole closed


def test_majority_filter_oracle(spark, ddb):
    cls = _classes_np()
    df = _df_from(spark, cls, "v")
    got = sorted(
        (r["ix"], r["iy"], r["v"])
        for r in mor.majority_filter(df, 1).collect()
    )
    ddb.sql("CREATE OR REPLACE TABLE _cls (ix INT, iy INT, v BIGINT)")
    ddb.executemany(
        "INSERT INTO _cls VALUES (?, ?, ?)",
        [(x, y, int(cls[y, x])) for y in range(NY) for x in range(NX)],
    )
    want = sorted(
        map(
            tuple,
            ddb.sql(
                """
        WITH nb AS (
          SELECT t.ix AS ix, t.iy AS iy, s.v AS v
          FROM _cls t JOIN _cls s
            ON abs(t.ix - s.ix) <= 1 AND abs(t.iy - s.iy) <= 1
        ), counts AS (
          SELECT ix, iy, v, count(*) AS n FROM nb GROUP BY ix, iy, v
        ), ranked AS (
          SELECT ix, iy, v, sum(n) OVER (PARTITION BY ix, iy) AS support,
                 row_number() OVER (PARTITION BY ix, iy
                                    ORDER BY n DESC, v ASC) AS rk
          FROM counts
        )
        SELECT ix, iy, v FROM ranked WHERE rk = 1 AND support = 9
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_focal_stats_oracle(spark, ddb):
    cls = _classes_np(seed=11)
    df = _df_from(spark, cls, "v")
    got = sorted(
        (r["ix"], r["iy"], r["f_min"], r["f_max"], r["f_sum"], r["f_n"], r["f_mean"])
        for r in mor.focal_stats(df, 1).collect()
    )
    ddb.sql("CREATE OR REPLACE TABLE _fs (ix INT, iy INT, v BIGINT)")
    ddb.executemany(
        "INSERT INTO _fs VALUES (?, ?, ?)",
        [(x, y, int(cls[y, x])) for y in range(NY) for x in range(NX)],
    )
    want = sorted(
        map(
            tuple,
            ddb.sql(
                """
        SELECT t.ix, t.iy, min(s.v), max(s.v), sum(s.v), count(*),
               CAST(sum(s.v) AS DOUBLE) / count(*)
        FROM _fs t JOIN _fs s
          ON abs(t.ix - s.ix) <= 1 AND abs(t.iy - s.iy) <= 1
        GROUP BY t.ix, t.iy HAVING count(*) = 9
        """
            ).fetchall(),
        )
    )
    assert got == want


def test_single_exchange_plan(spark):
    df = _df_from(spark, _mask_np(), "m")
    plan = (
        mor.erode(df, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") - plan.count("BroadcastExchange") == 1
