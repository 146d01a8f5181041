"""JSON table ingestion (SURVEY.md §2.1 S9, §2.8 JSON scalars).

The reference materializes DataFrames from HTTP JSON payloads (SSURGO SDA
POST responses, OData catalog pages — demeter/vector/usda/ssurgo.py:
109-134, sentinel2 search). The network half is out of sandbox scope; this
is the data-plane half, Spark-native: JSON-lines files (or an in-memory list
of payload strings) parsed with a DECLARED schema — `spark.read.schema(...)
.json` / `from_json`, never schema inference, so a 10^12-row JSON corpus
parses without a sampling pass and malformed rows surface explicitly
(PERMISSIVE + _corrupt_record) instead of silently skewing types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_json_table(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = True
) -> DataFrame:
    """JSON-lines files -> typed rows with the declared schema; malformed
    lines land in _corrupt_record when ``keep_corrupt`` (audit them, don't
    drop silently)."""
    full = schema + (", _corrupt_record STRING" if keep_corrupt else "")
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def parse_json_column(
    df: DataFrame, json_col: str, schema: str, prefix: str = ""
) -> DataFrame:
    """Parse an embedded JSON string column (e.g. an HTTP response body
    landed as text) into typed columns with a declared schema."""
    parsed = F.from_json(F.col(json_col), schema)
    out = df.withColumn("_parsed", parsed)
    for field in out.schema["_parsed"].dataType.fieldNames():
        out = out.withColumn(f"{prefix}{field}", F.col(f"_parsed.{field}"))
    return out.drop("_parsed")


def sda_table_from_response(
    spark: SparkSession, bodies: list[str], columns: str
) -> DataFrame:
    """SSURGO-SDA-style response decode: each body is
    '{"Table": [[...row...], ...]}' (ssurgo.py:109-134); rows are positional
    arrays of strings -> typed columns via the declared ``columns`` spec
    ('name TYPE, ...'). createDataFrame + explode keeps it one JVM pass."""
    raw = spark.createDataFrame([(b,) for b in bodies], "body STRING")
    rows = raw.select(
        F.explode(
            F.from_json(F.col("body"), "STRUCT<Table: ARRAY<ARRAY<STRING>>>")[
                "Table"
            ]
        ).alias("_r")
    )
    out = rows
    for i, spec in enumerate(columns.split(",")):
        name, typ = spec.strip().split(" ", 1)
        out = out.withColumn(name, F.col("_r")[i].cast(typ))
    return out.drop("_r")
