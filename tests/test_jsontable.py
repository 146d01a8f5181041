"""S9 JSON table ingestion: declared-schema parsing, corrupt-row auditing,
SDA positional-array response decode, A17 approx-distinct error bound."""

import pytest
from pyspark.sql import functions as F

from demeter_spark.sources import jsontable
from tests.conftest import SF_DIR


def test_read_json_table_declared_schema(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text(
        '{"mukey": 1, "name": "a", "pct": 55.5}\n'
        '{"mukey": 2, "name": "b", "pct": 44.5}\n'
        "this is not json\n"
        '{"mukey": "not-an-int", "name": "c", "pct": 1.0}\n'
    )
    df = jsontable.read_json_table(
        spark, str(p), "mukey BIGINT, name STRING, pct DOUBLE"
    )
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert {(r["mukey"], r["name"]) for r in good} == {(1, "a"), (2, "b")}
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2  # non-JSON line + type-violating line


def test_parse_json_column(spark):
    df = spark.createDataFrame(
        [('{"a": 3, "b": "x"}',), ('{"a": 4}',)], "payload STRING"
    )
    out = jsontable.parse_json_column(df, "payload", "a INT, b STRING")
    got = {(r["a"], r["b"]) for r in out.collect()}
    assert got == {(3, "x"), (4, None)}


def test_sda_response_decode(spark):
    bodies = [
        '{"Table": [["100", "Drummer", "85"], ["101", "Flanagan", "15"]]}',
        '{"Table": [["102", "Catlin", "60"]]}',
    ]
    df = jsontable.sda_table_from_response(
        spark, bodies, "mukey BIGINT, compname STRING, comppct INT"
    )
    got = {(r["mukey"], r["compname"], r["comppct"]) for r in df.collect()}
    assert got == {(100, "Drummer", 85), (101, "Flanagan", 15), (102, "Catlin", 60)}


def test_approx_distinct_error_bound(spark):
    """A17: approx_count_distinct within its advertised error of exact on
    the documents corpus (kept out of the oracle contract by design — the
    sketch is approximate; this bounds it instead)."""
    from demeter_spark.sources import synth

    docs = synth.documents(spark, SF_DIR)
    row = docs.agg(
        F.countDistinct("text").alias("exact"),
        F.approx_count_distinct("text", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row["approx"] - row["exact"]) <= max(3, 0.06 * row["exact"])
