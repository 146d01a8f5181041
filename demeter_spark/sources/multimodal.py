"""Multimodal (image/audio/video) columns as opaque binary + typed metadata.

The 100 TB training-data posture: media payloads are opaque ``binary``
columns; decode / feature-extract / resize / frame-sample run as Arrow-
batched ``mapInPandas`` kernels so bytes never round-trip through Python row
objects. Real codecs (PIL/ffmpeg) are absent in this sandbox, so the *codec*
step is stubbed (``decode_real`` raises NotImplementedError) while all the
Spark-side plumbing — schema, batch shape, binary Arrow transfer, partition
behavior — is real and oracle-tested against a deterministic fake format:

    payload = b"IMG|<width>|<height>|" + b"x" * n_fill

``media()`` synthesizes the table from documents closed-form, so the DuckDB
oracle regenerates identical bytes and the decode kernel's output is exactly
checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demeter_spark.sources.synth import documents


def media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic media table: (doc_id, kind, payload binary, meta map)."""
    return documents(spark, sf_dir).selectExpr(
        "doc_id",
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind",
        "CAST(doc_id % 64 + 1 AS INT) AS _w",
        "CAST(doc_id % 48 + 1 AS INT) AS _h",
    ).selectExpr(
        "doc_id",
        "kind",
        "encode(concat('IMG|', CAST(_w AS STRING), '|', CAST(_h AS STRING), '|', "
        "repeat('x', CAST(doc_id % 32 + 4 AS INT))), 'UTF-8') AS payload",
        "map('codec', 'fake', 'kind', kind) AS meta",
    )


def decode_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched binary decode -> typed features (the real plumbing).

    Parses the fake header per batch; a real deployment swaps the parser for
    an image/audio codec with the identical signature and schema.
    """

    def _decode(batches):
        for pdf in batches:
            # vectorized: bytes -> pandas string dtype once, then .str ops
            # (no per-row Python lambdas inside the Arrow batch)
            text = pdf["payload"].astype("bytes").str.decode("utf-8")
            parts = text.str.split("|", expand=True)
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "width": parts[1].astype("int32"),
                    "height": parts[2].astype("int32"),
                    "n_bytes": pdf["payload"].str.len().astype("int64"),
                }
            )
            out["aspect"] = out["width"].astype("float64") / out["height"]
            yield out

    return media_df.select("doc_id", "kind", "payload").mapInPandas(
        _decode,
        "doc_id BIGINT, kind STRING, width INT, height INT, n_bytes BIGINT, aspect DOUBLE",
    )


def decode_real(media_df: DataFrame) -> DataFrame:
    """Real-codec decode path — requires PIL/ffmpeg, absent in this sandbox."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "use decode_features (fake-format plumbing) instead"
        ) from e
    raise NotImplementedError("real decode not implemented in round 1")


MEDIA_ORACLE_SQL = """
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
           CAST(doc_id % 64 + 1 AS INT) AS width,
           CAST(doc_id % 48 + 1 AS INT) AS height,
           CAST(length('IMG||' || CAST(doc_id % 64 + 1 AS VARCHAR)
                 || CAST(doc_id % 48 + 1 AS VARCHAR) || '|')
                + doc_id % 32 + 4 AS BIGINT) AS n_bytes,
           CAST(doc_id % 64 + 1 AS DOUBLE) / CAST(doc_id % 48 + 1 AS INT) AS aspect
    FROM documents
"""


def resize_meta(media_df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning (multimodal mandate): target dimensions preserving
    aspect ratio, capped at ``max_side`` — the metadata half of a resize
    (the pixel kernel itself is the stubbed codec). Catalyst-only after the
    Arrow decode."""
    feats = decode_features(media_df)
    scale = F.when(
        F.greatest(F.col("width"), F.col("height")) > max_side,
        F.lit(float(max_side)) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    ).otherwise(F.lit(1.0))
    return feats.select(
        "doc_id",
        "kind",
        "width",
        "height",
        F.floor(F.col("width").cast("double") * scale).cast("int").alias("new_w"),
        F.floor(F.col("height").cast("double") * scale).cast("int").alias("new_h"),
    )


def sample_frames(media_df: DataFrame, stride_s: int = 7) -> DataFrame:
    """Frame sampling for video rows (multimodal mandate): one row per
    sampled frame at offsets 0, stride, 2*stride, ... < duration (the fake
    format's duration = header width, seconds). The frame-index fan-out is a
    Catalyst explode over the decoded header — a real deployment swaps the
    per-frame byte extraction into the same mapInPandas decode."""
    feats = decode_features(media_df).filter(F.col("kind") == "video")
    return feats.select(
        "doc_id",
        F.col("width").alias("duration_s"),
        F.explode(
            F.expr(f"sequence(0, CAST(width AS INT) - 1, {stride_s})")
        ).alias("offset_s"),
    ).withColumn("frame_idx", (F.col("offset_s") / F.lit(stride_s)).cast("int"))
