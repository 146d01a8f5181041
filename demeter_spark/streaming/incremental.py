"""Structured-Streaming skin over the batch-incremental mechanism.

The reference has no streaming operators (SURVEY.md §2.10); its closest
analogues are ordered group-at-a-time pipelining and replayable lazy
iterators (demeter/raster/sentinel2/ndvi.py:188-199, demeter/utils.py:10-30).
The north rule asks for *resumability*, which plans/lineage.py provides for
batch; this module adds the streaming flavor: a ``Trigger.AvailableNow``
file-source pipeline with a checkpoint directory — each invocation processes
exactly the files that arrived since the last committed offset, then stops.

The transformation is a stream-static join (geocode against the broadcast
gazetteer) + the same deterministic extraction expressions as batch — one
code path, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demeter_spark.sources import synth

PAGES_SCHEMA = (
    "doc_id BIGINT, url STRING, warc_ts TIMESTAMP, html BINARY, "
    "text STRING, lang STRING"
)


def incremental_geocode(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process newly-arrived page files exactly once (AvailableNow + checkpoint).

    Re-running after a stop resumes from the committed offsets; already-seen
    files are never reprocessed (exactly-once file-source semantics).
    """
    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    gaz = F.broadcast(synth.gazetteer(spark))
    geocoded = (
        stream.withColumn(
            "place", F.regexp_extract("text", "loc[0-9]{5}", 0)
        )
        .join(gaz, "place")
        .select("url", "doc_id", "place_id", "lon", "lat")
    )
    q = (
        geocoded.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
