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


def incremental_spatial_join(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    res: int = 8,
) -> None:
    """The FLAGSHIP pipeline as a stream: newly-arrived page files are
    geocoded, cover-joined to the parcel dimension (stream-static broadcast
    join — the static side is planned per micro-batch, so a refreshed parcel
    snapshot is picked up on the next increment) and PIP-refined, exactly
    once per file (AvailableNow + checkpoint).

    This is the continuous-ingest posture of the north rule: a 10^12-page
    corpus lands in batches; each arrival is joined and committed without
    reprocessing history, and a crash resumes from the last committed offset.
    """
    from demeter_spark.operators import joins

    stream = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    gaz = F.broadcast(synth.gazetteer(spark))
    geocoded = (
        stream.withColumn("place", F.regexp_extract("text", "loc[0-9]{5}", 0))
        .join(gaz, "place")
        .selectExpr(
            "url",
            "doc_id",
            "place_id",
            "lon + (((doc_id * 2654435761) % 4294967296) % 211 - 105) / 1000e0 AS lon",
            "lat + ((((doc_id * 2654435761) % 4294967296) div 211) % 211 - 105)"
            " / 1000e0 AS lat",
        )
    )
    joined = joins.spatial_join(geocoded, synth.parcels(spark), res=res).select(
        "url", "doc_id", "parcel_id"
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    threshold: float = 0.8,
) -> None:
    """Continuous-crawl near-dup detection as a STREAM: newly-arrived
    document files are deduplicated against everything committed so far.

    foreachBatch bridges Structured Streaming's exactly-once file-source
    offsets to the batch-incremental dedup state machine
    (operators/dedup.incremental_minhash_pairs over plans/lineage.py):
    the micro-batch id doubles as the increment id, so a replayed batch
    (crash between the batch function and the checkpoint commit) recommits
    the state idempotently, and the sink write is made idempotent BY the
    batch id: pairs land partitioned by ``batch_id`` with dynamic partition
    overwrite, so a replay overwrites its own partition instead of appending
    duplicates (foreachBatch sinks are the caller's responsibility to
    de-duplicate by batch_id — ADVICE r03). Pair semantics match the batch
    path: the union of all emitted micro-batches equals minhash_lsh_pairs
    over the full corpus (pytest-verified).
    """
    from demeter_spark.operators.dedup import incremental_minhash_pairs
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, state_dir)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(
        input_dir
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_minhash_pairs(
            log, batch_df, int(batch_id), threshold
        )
        (
            pairs.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_containment(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    threshold: float = 0.5,
    max_df: int | None = None,
) -> None:
    """Continuous-crawl CONTAINMENT detection as a STREAM — the winnowing
    analogue of streaming_dedup, over the same exactly-once bridge:
    foreachBatch maps the micro-batch id to the increment id of
    operators/dedup.incremental_containment_pairs (LineageLog-backed), and
    the sink is idempotent by batch_id (dynamic partition overwrite), so a
    replayed batch overwrites its own partition. With ``max_df=None`` the
    union of all emitted micro-batches equals batch containment_pairs over
    the full corpus (pytest-verified); with a cap, scores reflect document
    frequencies at completion time (the operator's documented monotone
    semantics)."""
    from demeter_spark.operators.dedup import incremental_containment_pairs
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, state_dir)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(
        input_dir
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        pairs = incremental_containment_pairs(
            log, batch_df, int(batch_id), threshold, max_df=max_df
        )
        (
            pairs.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_tile_pyramid(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    res_max: int,
    res_min: int = 0,
    value_col: str | None = None,
) -> None:
    """Continuously-maintained tile index as a STREAM: newly-arrived point
    files fold into the LineageLog-backed pyramid state exactly once
    (micro-batch id = increment id, same bridge as streaming_dedup), and
    each batch publishes the CURRENT multi-zoom pyramid snapshot.

    The sink is a full-snapshot overwrite rather than a partitioned append:
    the pyramid is a derived view of the committed base-tile partials, so a
    replayed batch recommits state idempotently and republishes an
    identical snapshot — last-write-wins is exactly-once here. The
    published snapshot equals the batch tile_pyramid over every point seen
    so far (pytest-verified)."""
    from demeter_spark.operators.tilepyramid import incremental_tile_pyramid
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, state_dir)
    schema = "lon DOUBLE, lat DOUBLE"
    if value_col is not None:
        schema += f", {value_col} BIGINT"
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        pyramid = incremental_tile_pyramid(
            log, batch_df, int(batch_id), res_max, res_min,
            value_col=value_col,
        )
        pyramid.write.mode("overwrite").parquet(output_dir)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_segment_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
    seg_words: int = 10,
) -> None:
    """Continuous-crawl segment (paragraph) dedup as a STREAM — the CCNet
    line-dedup stage over the same exactly-once bridge as streaming_dedup:
    foreachBatch maps the micro-batch id to the increment id of
    operators/dedup.incremental_segment_dedup (LineageLog-backed hash
    buckets, probe blind to its own increment), and the per-doc output is
    idempotent by batch_id (dynamic partition overwrite). When files
    arrive in doc order, the union of all emitted micro-batches equals
    batch segment_dedup over the full corpus (pytest-verified)."""
    from demeter_spark.operators.dedup import incremental_segment_dedup
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, state_dir)
    stream = spark.readStream.schema("doc_id BIGINT, text STRING").parquet(
        input_dir
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_segment_dedup(
            log, batch_df, int(batch_id), seg_words=seg_words
        )
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_link_graph(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    state_dir: str,
) -> None:
    """Continuous-crawl link-graph maintenance as a STREAM: each
    micro-batch of pages folds its host-edge partials into the
    LineageLog-backed graph (operators/linkgraph.incremental_link_graph)
    and rewrites the CURRENT aggregated edge table partitioned by
    batch_id — idempotent on replay via the same exactly-once bridge as
    the other skins. The union-equals-batch property is pytest-verified
    against host_pairs over the full corpus."""
    from demeter_spark.operators.linkgraph import incremental_link_graph
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, state_dir)
    stream = spark.readStream.schema("url STRING, html BINARY").parquet(
        input_dir
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        edges = incremental_link_graph(log, batch_df, int(batch_id))
        (
            edges.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_knn(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    k: int = 3,
    res: int = 6,
) -> None:
    """kNN as a stream (the stream-kNN-join posture of the SIGMOD'21
    Distributed Stream KNN Join line of work: per-arrival batch kNN
    against the indexed static side): each micro-batch of geocoded
    points runs the k-ring-doubling kNN join against the gazetteer
    inside foreachBatch — the ring loop takes driver actions, so it
    needs a materialized micro-batch, exactly what foreachBatch
    provides. Per-point results are independent of batching, so the
    union of micro-batches equals the batch kNN over all points
    (pytest-verified); the sink is idempotent by batch_id."""
    from demeter_spark.operators import joins

    stream = spark.readStream.schema(
        "url STRING, doc_id BIGINT, place_id BIGINT,"
        " lon DOUBLE, lat DOUBLE"
    ).parquet(input_dir)
    gaz = synth.gazetteer(spark)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        out = joins.knn_join(batch_df, gaz, k=k, res=res).select(
            "url", "place_id", "rank"
        )
        (
            out.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def streaming_frontier(
    spark: SparkSession,
    sitemap_dir: str,
    corpus_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Continuous frontier refresh: each micro-batch of newly-fetched
    sitemap XML is parsed and planned against the CURRENT crawled corpus
    (stream-static join — the corpus snapshot is re-planned per batch,
    so yesterday's fetches count as crawled today), emitting a
    prioritized fetch list per batch; idempotent by batch_id. Robots and
    rank dimensions are deliberately omitted here — the batch planner
    (operators/frontier.plan_frontier) takes them when the caller has
    them; the streaming skin exercises the new/stale core."""
    from demeter_spark.operators.frontier import plan_frontier
    from demeter_spark.sources.sitemap import parse_sitemap

    stream = spark.readStream.schema("host STRING, xml STRING").parquet(
        sitemap_dir
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        corpus = batch_df.sparkSession.read.schema(
            "url STRING, warc_ts TIMESTAMP"
        ).parquet(corpus_dir)
        plan = plan_frontier(parse_sitemap(batch_df), corpus)
        (
            plan.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(output_dir)
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
