"""S13 zip member extraction (real zipfile over binaryFile source) and
property-based as-of join verification against pandas merge_asof."""

import io
import zipfile

import numpy as np
import pandas as pd
import pytest

from demeter_spark.operators.asof import asof_join
from demeter_spark.sources.archives import extract_members, read_archives


def test_zip_member_extraction(spark, tmp_path):
    for i in range(3):
        with zipfile.ZipFile(tmp_path / f"delivery{i}.zip", "w") as zf:
            zf.writestr(f"tabular/comp{i}.txt", f"component-data-{i}" * 10)
            zf.writestr(f"spatial/shape{i}.dbf", bytes([i]) * 50)
            zf.writestr("readme.md", "ignore me")
    archives = read_archives(spark, str(tmp_path))
    assert archives.count() == 3

    dbf = extract_members(archives, "*.dbf").collect()
    assert len(dbf) == 3
    by_member = {r["member"]: r for r in dbf}
    assert set(by_member) == {f"spatial/shape{i}.dbf" for i in range(3)}
    assert bytes(by_member["spatial/shape2.dbf"]["data"]) == bytes([2]) * 50
    assert by_member["spatial/shape2.dbf"]["n_bytes"] == 50

    every = extract_members(archives)
    assert every.count() == 9


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized parity with pandas merge_asof (backward, inclusive) across
    many keys and tie patterns."""
    rng = np.random.default_rng(17)
    n_l, n_r = 400, 300
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_l),
            "ts": rng.integers(0, 1000, n_l).astype("int64"),
            "lid": np.arange(n_l),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 12, n_r),
            "ts": rng.integers(0, 1000, n_r).astype("int64"),
            "value": rng.integers(0, 10_000, n_r).astype("float64"),
        }
    )
    # merge_asof needs unique right (k, ts) for deterministic comparison
    right = right.drop_duplicates(["k", "ts"]).reset_index(drop=True)

    ldf = spark.createDataFrame(left.assign(ts=left.ts)).withColumnRenamed("k", "k")
    rdf = spark.createDataFrame(right)
    got = (
        asof_join(ldf, rdf, on="k", value_cols=("value",))
        .select("lid", "r_ts", "r_value")
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )

    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts"),
        on="ts",
        by="k",
        direction="backward",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)

    assert (
        got["r_value"].fillna(-1).to_numpy()
        == want["value"].fillna(-1).to_numpy()
    ).all()
