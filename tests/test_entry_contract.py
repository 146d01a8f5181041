"""Emulates the driver's correctness gate: every queries() entry must match
its oracle_sql() DuckDB result on row count, column names, and values
(order-insensitive), at sf0.001 for speed (driver runs sf0.01)."""

import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


def _norm_rows(cols, rows):
    out = []
    for row in rows:
        vals = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    vals.append("NaN")
                else:
                    vals.append(f"{v:.9g}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, ddb, name):
    q = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    if name not in oracles:
        assert len(spark_rows) >= 0  # weaker rows-only check
        return
    rel = ddb.sql(oracles[name])
    duck_cols = [c.lower() for c in rel.columns]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows)
    # align column order by name before value compare
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s = _norm_rows(None, [[r[i] for i in sidx] for r in spark_rows])
    d = _norm_rows(None, [[r[i] for i in didx] for r in duck_rows])
    assert s == d, f"value mismatch in {name}: {s[:3]} vs {d[:3]}"


def test_registry_within_driver_gate_budget():
    """The driver's correctness gate verifies at most 50 queries per round
    (VERDICT r03 #1: 8 of 58 once rode on stale evidence). Keep the
    registry at or under the budget so EVERY exposed query re-verifies
    every round, and keep query/oracle keys in lockstep."""
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) <= 50, (
        f"{len(q)} queries exceed the 50-row driver gate: fold or retire "
        f"before adding more (see SURVEY.md round-4 note)"
    )
    assert set(q) == set(o), (set(q) ^ set(o))
