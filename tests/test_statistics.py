"""A8/A9 variance algebra vs a direct numpy re-implementation of the
reference formulas (demeter/utils.py:59-103)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import statistics as st


def test_layered_carbon_stock_matches_numpy(spark):
    rows = []
    rng = np.random.default_rng(11)
    for cell in range(6):
        for lo, hi in ((0, 10), (10, 30), (30, 60)):
            m = float(rng.integers(10, 90))
            rows.append(
                (cell, lo, hi - lo, m, m * 0.8, m * 1.3, m / 10 + 1,
                 (m / 10 + 1) * 0.9, (m / 10 + 1) * 1.1)
            )
    df = spark.createDataFrame(
        rows,
        "cell BIGINT, depth_lo INT, thickness INT, soc_mean DOUBLE,"
        " soc_p5 DOUBLE, soc_p95 DOUBLE, bd_mean DOUBLE, bd_p5 DOUBLE,"
        " bd_p95 DOUBLE",
    )
    got = {
        r["cell"]: (r["stock_mean"], r["stock_stddev"])
        for r in st.layered_carbon_stock(df, keys=("cell",)).collect()
    }

    def ref_sd(p5s, p95s, ws):
        var = [((p5 - p95) / (2 * 1.645)) ** 2 for p5, p95 in zip(p5s, p95s)]
        return math.sqrt(np.average(var, weights=np.array(ws) ** 2))

    def ref_stock_sd(xm, xs, ym, ys):
        vx, vy = xs**2, ys**2
        return math.sqrt(vx * vy + vx * ym**2 + vy * xm**2)

    by_cell = {}
    for cell, lo, w, sm, s5, s95, bm, b5, b95 in rows:
        by_cell.setdefault(cell, []).append((w, sm, s5, s95, bm, b5, b95))
    for cell, lay in by_cell.items():
        ws = [x[0] for x in lay]
        socm = np.average([x[1] for x in lay], weights=ws)
        socsd = ref_sd([x[2] for x in lay], [x[3] for x in lay], ws)
        bdm = np.average([x[4] for x in lay], weights=ws)
        bdsd = ref_sd([x[5] for x in lay], [x[6] for x in lay], ws)
        gm, gs = got[cell]
        assert gm == pytest.approx(socm * bdm, rel=1e-12)
        assert gs == pytest.approx(ref_stock_sd(socm, socsd, bdm, bdsd), rel=1e-12)


def test_weighted_variance_null_layer_drops_out(spark):
    """numpy.ma parity: a masked layer leaves numerator AND denominator."""
    df = spark.createDataFrame(
        [(1, 10, 4.0), (1, 20, None), (1, 30, 9.0)],
        "cell BIGINT, w INT, var DOUBLE",
    )
    got = df.groupBy("cell").agg(
        st.weighted_variance_agg(F.col("var"), F.col("w")).alias("v")
    ).first()["v"]
    assert got == pytest.approx((4.0 * 100 + 9.0 * 900) / (100 + 900))
