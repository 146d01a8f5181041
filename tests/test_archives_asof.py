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


def test_asof_duplicate_right_ts_deterministic(spark):
    """ADVICE r02: duplicate right (key, ts) rows must resolve
    deterministically — the greatest value tuple wins, independent of
    partition order (asserted stable across shuffled input orders)."""
    ldf = spark.createDataFrame(
        [(1, 5, 100)], "lid INT, k INT, ts BIGINT"
    )
    rows = [(5, 100, float(v)) for v in (3, 9, 1, 7)]  # all tie at ts=100
    for seed in range(3):
        import random

        shuffled = rows[:]
        random.Random(seed).shuffle(shuffled)
        rdf = spark.createDataFrame(
            shuffled, "k INT, ts BIGINT, value DOUBLE"
        ).repartition(4)
        got = asof_join(ldf, rdf, on="k", value_cols=("value",)).collect()
        assert len(got) == 1
        assert got[0]["r_value"] == 9.0  # greatest tuple, every time


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


def _make_dbf(records, fields):
    """Build a real dBase III file: fields = [(name, length)], records =
    list of tuples of strings (fixed-width, right-padded)."""
    import struct

    n = len(records)
    header_size = 32 + 32 * len(fields) + 1
    record_size = 1 + sum(ln for _, ln in fields)
    out = bytearray()
    out += bytes([0x03, 124, 1, 1])  # version, YMD
    out += struct.pack("<I", n)
    out += struct.pack("<H", header_size)
    out += struct.pack("<H", record_size)
    out += bytes(20)
    for name, ln in fields:
        d = bytearray(32)
        d[0:11] = name.encode("ascii").ljust(11, b"\x00")
        d[11] = ord("N")
        d[16] = ln
        out += d
    out += b"\x0d"
    for rec in records:
        out += b" "  # active
        for (name, ln), val in zip(fields, rec):
            out += val.encode("ascii").ljust(ln, b" ")[:ln]
    out += b"\x1a"
    return bytes(out)


def test_dbf_truncated_blob_fails_loudly():
    """ADVICE r02: a truncated/corrupt .dbf must raise, not yield
    empty-string garbage rows."""
    import pytest as _pytest

    from demeter_spark.sources.archives import parse_dbf

    fields = [("VALUE", 6), ("NHDPlusID", 14)]
    blob = _make_dbf([("1", "55000100000.0")] * 4, fields)
    with _pytest.raises(ValueError, match="truncated DBF"):
        parse_dbf(blob[:-10])  # records cut short
    with _pytest.raises(ValueError, match="corrupt DBF"):
        parse_dbf(blob[:20])  # header cut short
    with _pytest.raises(ValueError, match="corrupt DBF"):
        parse_dbf(b"\x03\x00\x00\x00")  # no header at all


def test_dbf_sidecar_to_dimension_map(spark, tmp_path):
    """S7 end-to-end: zip with a .vat.dbf sidecar -> extract -> parse ->
    try_cast dimension map (float-encoded ids, null-char garbage rows
    skipped — hydrography.py:231-240 semantics) -> broadcast remap join."""
    import zipfile

    from pyspark.sql import functions as F

    from demeter_spark.sources.archives import dbf_records

    fields = [("VALUE", 6), ("NHDPlusID", 14)]
    recs = [
        ("1", "55000100000.0"),
        ("2", "55000200000.0"),
        ("3", "\x00" * 14),  # the reference's garbage-row case
        ("4", "55000400000.0"),
    ]
    blob = _make_dbf(recs, fields)
    # round-trip through our own parser first
    from demeter_spark.sources.archives import parse_dbf

    table = parse_dbf(blob)
    assert list(table.columns) == ["VALUE", "NHDPlusID"]
    assert table["VALUE"].tolist() == ["1", "2", "3", "4"]

    with zipfile.ZipFile(tmp_path / "hydro.zip", "w") as zf:
        zf.writestr("raster1.tif.vat.dbf", blob)
        zf.writestr("raster1.tif", b"fake")
    archives = read_archives(spark, str(tmp_path))
    members = extract_members(archives, "*.vat.dbf")
    dim = (
        dbf_records(members)
        .select(
            F.expr("try_cast(fields['VALUE'] AS INT)").alias("value"),
            F.expr("try_cast(try_cast(fields['NHDPlusID'] AS DOUBLE) AS BIGINT)").alias(
                "catchment_id"
            ),
        )
        .filter("catchment_id IS NOT NULL")
    )
    got = {r["value"]: r["catchment_id"] for r in dim.collect()}
    assert got == {1: 55000100000, 2: 55000200000, 4: 55000400000}

    # the remap join: pixel values -> catchment ids via the broadcast dim
    pixels = spark.range(100).selectExpr("CAST(id % 5 AS INT) AS value")
    remapped = pixels.join(F.broadcast(dim), "value").groupBy("catchment_id").count()
    assert remapped.count() == 3
