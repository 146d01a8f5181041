"""Resumability (lineage commits), skew salting equivalence, and the
streaming incremental skin — the north rule's operational requirements."""

import os

import pytest

from pyspark.sql import functions as F

from demeter_spark.operators import joins
from demeter_spark.plans.lineage import LineageLog
from demeter_spark.plans import skew
from demeter_spark.sources import synth
from tests.conftest import SF_DIR


def test_lineage_resume_skips_committed_parts(spark, tmp_path):
    base = str(tmp_path / "lineage")
    log = LineageLog(spark, base)
    pages = synth.pages(spark, SF_DIR).withColumn(
        "bucket", F.pmod(F.col("doc_id"), F.lit(8))
    )
    fp = "pages-v1"

    # simulated crash: first run only manages parts 0-3
    partial = pages.filter("bucket < 4")
    n1 = log.write_increment("geocode", partial, "bucket", fp)
    assert n1 == 4

    # resumed run over the full input: only the missing 4 parts are written
    n2 = log.write_increment("geocode", pages, "bucket", fp)
    assert n2 == 4
    # third run: nothing to do
    assert log.write_increment("geocode", pages, "bucket", fp) == 0

    # data is complete and exactly once
    out = log.read_stage("geocode")
    assert out.count() == pages.count()
    assert out.select("doc_id").distinct().count() == pages.count()

    # metrics table carries per-partition row counts
    m = {r["part"]: r["n_rows"] for r in log.metrics().filter("stage='geocode'").collect()}
    expected = {
        r["bucket"]: r["n"]
        for r in pages.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert m == expected

    # a changed input fingerprint invalidates commits (full recompute)
    assert log.write_increment("geocode", pages, "bucket", "pages-v2") == 8


def test_manifest_compaction_bounds_file_count(spark, tmp_path):
    """~50 commits: manifest file count stays bounded by compact_every and
    snapshot ordering / pinned reads / metrics survive every rewrite."""
    base = str(tmp_path / "lineage_compact")
    log = LineageLog(spark, base, compact_every=8)
    for i in range(50):
        df = spark.range(5).selectExpr(
            "id AS v", f"CAST({i} AS BIGINT) AS bucket"
        )
        assert log.write_increment("stage_a", df, "bucket", "fp1") == 1
    files = [
        f
        for _, _, fs in os.walk(os.path.join(base, "_snapshots"))
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(files) <= 8, files  # not 50: compaction keeps it bounded
    ids = log.snapshot_ids("stage_a")
    assert len(ids) == 50
    # snapshot-pinned read still exact across compaction rewrites
    mid = log.read_stage("stage_a", as_of=ids[24])
    assert mid.select("_part").distinct().count() == 25
    assert mid.count() == 25 * 5
    assert log.metrics().filter("stage='stage_a'").count() == 50


def test_salted_join_equals_plain_join(spark, ddb):
    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    plain = {
        (r["url"], r["parcel_id"])
        for r in joins.spatial_join(pts, par, res=8).collect()
    }
    # detect hot cells honestly from the data (place 0 holds ~25% of pages)
    from demeter_spark.functions.spark_udfs import cell_of

    with_cell = pts.withColumn("_cell", cell_of(F.col("lon"), F.col("lat"), 8))
    hot = skew.detect_hot_cells(with_cell, threshold_ratio=0.05)
    assert hot, "synthetic skew must produce hot cells"
    salted = {
        (r["url"], r["parcel_id"])
        for r in joins.spatial_join(
            pts, par, res=8, broadcast_cover=False, hot_cells=hot
        ).collect()
    }
    assert salted == plain


def test_streaming_incremental_exactly_once(spark, tmp_path):
    from demeter_spark.streaming.incremental import incremental_geocode

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth.pages(spark, SF_DIR)

    # batch 1 arrives
    pages.filter("doc_id % 2 = 0").write.mode("append").parquet(in_dir)
    incremental_geocode(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()

    # re-run with no new data: nothing reprocessed
    incremental_geocode(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == n1

    # batch 2 arrives: only the new files are processed
    pages.filter("doc_id % 2 = 1").write.mode("append").parquet(in_dir)
    incremental_geocode(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    assert out.count() == synth.page_points(spark, SF_DIR).count()
    assert out.select("url").distinct().count() == out.count()


def test_observe_stage_metrics(spark):
    from demeter_spark.plans.lineage import observe_stage

    pts = synth.page_points(spark, SF_DIR)
    df, obs = observe_stage(pts, "geocode")
    n = df.count()
    assert obs.get["n_rows"] == n > 0


def test_streaming_windowed_watermark(spark, tmp_path):
    """Watermarked tumbling windows emit exactly once; late-arriving batches
    past the watermark do not duplicate already-emitted windows."""
    from pyspark.sql import functions as F

    from demeter_spark.streaming.windowed import windowed_event_counts

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    # batch 1: first half of the timeline
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = lohi["lo"] + (lohi["hi"] - lohi["lo"]) / 2
    ev.filter(F.col("ts") <= F.lit(mid)).write.mode("append").parquet(in_dir)
    windowed_event_counts(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()

    # batch 2: the rest arrives; watermark advances, more windows close
    ev.filter(F.col("ts") > F.lit(mid)).write.mode("append").parquet(in_dir)
    windowed_event_counts(spark, in_dir, out_dir, ckpt)
    out = spark.read.parquet(out_dir)
    n2 = out.count()
    assert n2 >= n1
    # no window/event_type pair emitted twice
    assert (
        out.groupBy("window_start", "event_type").count().filter("count > 1").count()
        == 0
    )


def test_stateful_streaming_sessions(spark, tmp_path):
    """applyInPandasWithState sessionizer: sessions closed by a later batch
    must match the batch sessionizer's gap semantics."""
    from pyspark.sql import functions as F

    from demeter_spark.streaming.stateful import streaming_sessions

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    lohi = ev.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    mid = lohi["lo"] + (lohi["hi"] - lohi["lo"]) / 2

    ev.filter(F.col("ts") <= F.lit(mid)).write.mode("append").parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    ev.filter(F.col("ts") > F.lit(mid)).write.mode("append").parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir)
    assert got.count() > 0
    # closed sessions must be a subset of the batch sessionizer's sessions
    import __spark_entry__ as m

    batch = (
        m.queries()["events_windows"](spark, SF_DIR)
        .filter("kind = 'session'")
        .selectExpr(
            "CAST(k AS BIGINT) AS user_id",
            "win_start AS session_start",
            "win_end AS session_end",
            "n_events",
        )
    )
    missing = got.join(
        batch, ["user_id", "session_start", "session_end", "n_events"], "left_anti"
    )
    assert missing.count() == 0, missing.limit(5).collect()


def test_stateful_sessions_out_of_order_batches(spark, tmp_path):
    """A late event (earlier ts than the open session's end, arriving in a
    later micro-batch) must backfill the open session, not regress its end
    and fake a session split (ADVICE round 1)."""
    from demeter_spark.streaming.stateful import streaming_sessions

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def ev(eid, sec):
        from datetime import datetime, timezone

        return (eid, datetime.fromtimestamp(sec, tz=timezone.utc), 7, "c", 1.0, "{}")

    # batch 1: t=0 and t=200 (open session end=200)
    spark.createDataFrame([ev(1, 0), ev(2, 200)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    # batch 2: t=100 arrives LATE (inside the open session), then t=10000
    # exceeds the 1800s gap vs end=200 and closes the session
    spark.createDataFrame([ev(3, 100), ev(4, 10_000)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)

    got = spark.read.parquet(out_dir).collect()
    assert len(got) == 1
    r = got[0]
    assert r["n_events"] == 3
    assert r["session_start"].timestamp() == 0
    assert r["session_end"].timestamp() == 200


def test_streaming_spatial_join_exactly_once(spark, tmp_path):
    """Flagship-as-a-stream: two file arrivals, each joined exactly once;
    union of increments == the batch spatial join on the full input."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import joins
    from demeter_spark.sources import synth
    from demeter_spark.streaming.incremental import incremental_spatial_join

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    pages = synth.pages(spark, SF_DIR)
    pages.filter("doc_id % 2 = 0").write.mode("append").parquet(in_dir)
    incremental_spatial_join(spark, in_dir, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    pages.filter("doc_id % 2 = 1").write.mode("append").parquet(in_dir)
    incremental_spatial_join(spark, in_dir, out_dir, ckpt)
    got = spark.read.parquet(out_dir)
    assert got.count() > n1 > 0
    batch = joins.spatial_join(
        synth.page_points(spark, SF_DIR), synth.parcels(spark), res=8
    ).select("url", "doc_id", "parcel_id")
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_read_stage_as_of_snapshot(spark, tmp_path):
    """Snapshot-pinned reads: as_of the first commit sees only its
    partitions; the latest read sees both; unknown ids fail loudly."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS LONG) AS b")
    log.write_increment("s", df.filter("b < 2"), "b", "fp1")
    log.write_increment("s", df, "b", "fp1")  # adds parts 2, 3 only
    snaps = log.snapshot_ids("s")
    assert len(snaps) == 2
    first = log.read_stage("s", as_of=snaps[0])
    assert first.count() == 50
    assert set(r["_part"] for r in first.select("_part").distinct().collect()) == {0, 1}
    assert log.read_stage("s", as_of=snaps[1]).count() == 100
    assert log.read_stage("s").count() == 100
    with _pytest.raises(ValueError, match="unknown snapshot"):
        log.read_stage("s", as_of="nope")


def test_read_stage_schema_evolution_add_column(spark, tmp_path):
    """Add-column evolution (VERDICT r03 #9): a later increment carries an
    extra column; read_stage returns the union schema, older partitions
    surface NULL for it, and snapshot-pinned reads of the pre-evolution
    commit still work."""
    from pyspark.sql import functions as F

    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, str(tmp_path))
    df = spark.range(100).selectExpr("id", "CAST(id % 4 AS LONG) AS b")
    log.write_increment("s", df.filter("b < 2"), "b", "fp1")
    evolved = df.withColumn("score", (F.col("id") * 2).cast("long"))
    log.write_increment("s", evolved, "b", "fp1")  # parts 2,3 w/ new column
    out = log.read_stage("s")
    assert "score" in out.columns
    assert out.count() == 100
    # pre-evolution partitions read as NULL for the added column
    assert out.filter("_part < 2 AND score IS NOT NULL").count() == 0
    assert out.filter("_part >= 2 AND score IS NULL").count() == 0
    assert out.filter("_part >= 2 AND score = id * 2").count() == 50
    # the pre-evolution snapshot still reads (union schema, all-NULL score)
    snaps = log.snapshot_ids("s")
    first = log.read_stage("s", as_of=snaps[0])
    assert first.count() == 50
    assert first.filter("score IS NOT NULL").count() == 0


def test_stateful_sessions_pre_start_late_event_splits(spark, tmp_path):
    """A late event more than a gap BEFORE the open session's start must
    close as its own session, not weld into the open one (batch parity)."""
    from datetime import datetime, timezone

    from demeter_spark.streaming.stateful import streaming_sessions

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def ev(eid, sec):
        return (eid, datetime.fromtimestamp(sec, tz=timezone.utc), 9, "c", 1.0, "{}")

    spark.createDataFrame([ev(1, 10_000)], schema).write.mode("append").parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    # batch 2: t=100 (way before the open session), then t=50000 closes all
    spark.createDataFrame([ev(2, 100), ev(3, 50_000)], schema).write.mode(
        "append"
    ).parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    got = sorted(
        (r["session_start"].timestamp(), r["session_end"].timestamp(), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    )
    assert got == [(100.0, 100.0, 1), (10_000.0, 10_000.0, 1)]


def test_stateful_sessions_late_chain_welds_transitively(spark, tmp_path):
    """ADVICE r02: a late-event CHAIN t1 < cur_s - gap <= t2 with
    t2 - t1 <= gap must weld whole into the open session (the batch
    sessionizer would merge all three), not split at the flat cutoff."""
    from datetime import datetime, timezone

    from demeter_spark.streaming.stateful import streaming_sessions

    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    schema = (
        "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
        "value DOUBLE, props STRING"
    )

    def ev(eid, sec):
        return (eid, datetime.fromtimestamp(sec, tz=timezone.utc), 5, "c", 1.0, "{}")

    # open session starts at t=10000 (gap = 1800)
    spark.createDataFrame([ev(1, 10_000)], schema).write.mode("append").parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    # late chain: 7000 < 10000-1800, but 7000 -> 8600 -> 10000 all gaps
    # <= 1800 -> everything is ONE session; t=50000 then closes it
    spark.createDataFrame(
        [ev(2, 7_000), ev(3, 8_600), ev(4, 50_000)], schema
    ).write.mode("append").parquet(in_dir)
    streaming_sessions(spark, in_dir, out_dir, ckpt)
    got = sorted(
        (r["session_start"].timestamp(), r["session_end"].timestamp(), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    )
    # batch twin: sessions {7000, 8600, 10000} then {50000} (still open)
    assert got == [(7_000.0, 10_000.0, 3)]


def test_write_increment_does_not_recommit_other_fingerprint_parts(spark, tmp_path):
    """Partitions committed under fp1 but absent from fp2's input must NOT
    be committed (with fp1's stale bytes) under fp2."""
    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, str(tmp_path))
    df = spark.range(80).selectExpr("id", "CAST(id % 4 AS LONG) AS b")
    assert log.write_increment("s", df, "b", "fp1") == 4
    # fp2's input only has parts 0 and 1
    assert log.write_increment("s", df.filter("b < 2"), "b", "fp2") == 2
    snaps = log.snapshots().filter("fingerprint = 'fp2'")
    parts = sorted(r["part"] for r in snaps.collect())
    assert parts == [0, 1]


def test_expire_snapshots_narrows_time_travel_only(spark, tmp_path):
    """Iceberg-style expiry: folding old snapshots must keep committed
    partitions, metrics, and retained-snapshot reads EXACTLY as before —
    only as_of on an expired id stops resolving."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, str(tmp_path))
    df = spark.range(120).selectExpr("id", "CAST(id % 6 AS LONG) AS b")
    for hi in (2, 4, 6):  # three commits of two partitions each
        log.write_increment("s", df.filter(f"b < {hi}"), "b", "fp1")
    ids = log.snapshot_ids("s")
    assert len(ids) == 3
    before_latest = log.read_stage("s").count()
    before_mid = log.read_stage("s", as_of=ids[1]).count()

    n = log.expire_snapshots("s", keep_last=2)
    assert n == 1
    # committed partitions unchanged -> a re-run writes nothing
    assert log.write_increment("s", df, "b", "fp1") == 0
    assert log.read_stage("s").count() == before_latest
    # the retained mid snapshot reads exactly as before (it absorbed the
    # expired snapshot's rows)
    assert log.read_stage("s", as_of=ids[1]).count() == before_mid
    assert log.snapshot_ids("s") == ids[1:]
    with _pytest.raises(ValueError, match="unknown snapshot"):
        log.read_stage("s", as_of=ids[0])
    # metrics survive (6 partitions, one commit each)
    assert log.metrics().filter("stage = 's'").count() == 6
    # no-op when the window is already narrow; bad keep_last fails loudly
    assert log.expire_snapshots("s", keep_last=5) == 0
    with _pytest.raises(ValueError, match="keep_last"):
        log.expire_snapshots("s", keep_last=0)


def test_auto_hot_cells_from_lineage_metrics(spark, tmp_path):
    """VERDICT r04 #7, the metrics -> detect -> salted-plan chain: an ingest
    run commits points through a cell-partitioned LineageLog stage; the skew
    decision then reads the MANIFEST ONLY (no fact scan), and
    spatial_join(hot_cells='auto') salts exactly those cells with identical
    rows to the plain join."""
    from demeter_spark.functions.spark_udfs import cell_of

    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    with_cell = pts.withColumn("_cell", cell_of(F.col("lon"), F.col("lat"), 8))

    # ingest run: commit the points partitioned by cell id
    log = LineageLog(spark, str(tmp_path / "points_lineage"))
    log.write_increment("points_by_cell", with_cell, "_cell", "crawl-v1")

    # manifest-driven detection must agree with the direct aggregation
    auto_hot = skew.hot_cells_from_metrics(log, "points_by_cell", 0.05)
    direct_hot = skew.detect_hot_cells(with_cell, threshold_ratio=0.05)
    assert sorted(auto_hot) == sorted(direct_hot) and auto_hot

    plain = {
        (r["url"], r["parcel_id"])
        for r in joins.spatial_join(pts, par, res=8).collect()
    }

    df = joins.spatial_join(
        pts, par, res=8, broadcast_cover=False, hot_cells="auto",
        skew_log=log, skew_stage="points_by_cell", hot_threshold=0.05,
    )
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "_salt" in plan, plan  # the auto decision produced a SALTED join
    assert {(r["url"], r["parcel_id"]) for r in df.collect()} == plain

    # sampled fallback (no lineage state available) takes the same auto path
    df2 = joins.spatial_join(
        pts, par, res=8, broadcast_cover=False, hot_cells="auto",
        hot_threshold=0.05,
    )
    assert "_salt" in df2._jdf.queryExecution().optimizedPlan().toString()
    assert {(r["url"], r["parcel_id"]) for r in df2.collect()} == plain

    with pytest.raises(ValueError, match="auto"):
        joins.spatial_join(pts, par, hot_cells="bogus")
