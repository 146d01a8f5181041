"""Plan-shape guards for the skew decision path and the explode-stage
repartition policies (VERDICT r05 #5/#6/#7, ADVICE r05).

These pin properties that a later edit could silently break:
- winnowing_fingerprints is a SINGLE-shuffle operator (the doc-key
  repartition, reused by the window aggregate's partitionBy);
- shingles() keys by doc ONLY when the input parallelism is deficient;
- hot_cells="auto" on the broadcast cover join resolves to the plain plan
  (no shuffle to skew -> no salt), so the production entry query can run
  the decision path with zero plan cost;
- hot_cells_from_metrics counts only the LATEST fingerprint per partition.
"""

import re

from pyspark.sql import functions as F

from demeter_spark.operators import dedup, joins
from demeter_spark.operators.textstats import winnowing_fingerprints
from demeter_spark.plans import skew
from demeter_spark.plans.lineage import LineageLog
from demeter_spark.sources import synth
from tests.conftest import SF_DIR

_SHUFFLE = re.compile(r"(?<!Broadcast)Exchange")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_winnowing_shuffle_free_kernel(spark):
    """The vectorized winnowing kernel is NARROW (mapInPandas): the only
    Exchange a deficient (1-partition) input sees is the conditional
    doc-key widening, and an already-wide input sees NONE — no gram rows
    ever exist JVM-side to shuffle or sort."""
    corpus = synth.dedup_corpus(spark, SF_DIR).coalesce(1)
    plan = _plan(winnowing_fingerprints(corpus))
    assert len(_SHUFFLE.findall(plan)) == 1, plan

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = synth.dedup_corpus(spark, SF_DIR).repartition(width * 2)
    plan_wide = _plan(winnowing_fingerprints(wide))
    # the caller's own round-robin repartition is the only Exchange
    assert len(_SHUFFLE.findall(plan_wide)) == 1, plan_wide
    assert "hashpartitioning(doc_id" not in plan_wide, plan_wide


def test_shingles_repartition_is_conditional(spark):
    """Deficient input (1 partition) -> shingles inserts a doc-key hash
    repartition; already-wide input -> it must NOT add one (the raw-text
    shuffle would cost more than the map-side-combined aggregate rows
    downstream groupBys shuffle)."""
    corpus = synth.dedup_corpus(spark, SF_DIR).coalesce(1)
    plan_narrow = _plan(dedup.shingles(corpus))
    assert "hashpartitioning(doc_id" in plan_narrow, plan_narrow

    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wide = synth.dedup_corpus(spark, SF_DIR).repartition(width * 2)
    plan_wide = _plan(dedup.shingles(wide))
    # the only Exchange is the caller's own round-robin repartition — the
    # operator added no doc-key shuffle
    assert "hashpartitioning(doc_id" not in plan_wide, plan_wide
    # the explicit hint skips the plan-forcing probe and must behave the same
    plan_hint = _plan(dedup.shingles(wide, n_input=width * 2))
    assert "hashpartitioning(doc_id" not in plan_hint, plan_hint


def test_spatial_join_auto_on_broadcast_path_is_plain_plan(spark):
    """VERDICT r05 #6: the flagship entry query passes hot_cells='auto' on
    the (default) broadcast cover join. A broadcast join has no shuffle to
    skew, so auto must resolve to NO salting: bit-identical plan to the
    plain call and identical rows."""
    pts = synth.page_points(spark, SF_DIR)
    par = synth.parcels(spark)
    auto = joins.spatial_join(pts, par, res=8, hot_cells="auto")
    plain = joins.spatial_join(pts, par, res=8)
    # strip expr ids + plan ids (fresh per plan instantiation)
    norm = lambda p: re.sub(r"#\d+|plan_id=\d+", "", p)  # noqa: E731
    p_auto, p_plain = _plan(auto), _plan(plain)
    assert "_salt" not in p_auto, p_auto
    assert norm(p_auto) == norm(p_plain)
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_hot_cells_from_metrics_latest_fingerprint_only(spark, tmp_path):
    """ADVICE r05: a stage re-ingested under a new fingerprint leaves the
    old fingerprint's manifest rows in place; the skew decision must count
    each partition's LATEST fingerprint only, not the sum across history
    (which would double-count re-written partitions)."""
    log = LineageLog(spark, str(tmp_path / "lin"))
    v1 = spark.createDataFrame(
        [(c, i) for c in range(10) for i in range(100 if c == 0 else 10)],
        "cell INT, i INT",
    )
    log.write_increment("pts", v1, "cell", "crawl-v1")
    # v1 state: cell 0 holds 100/190 rows -> hot at any sane threshold
    assert skew.hot_cells_from_metrics(log, "pts", 0.25) == [0]

    # re-ingest cell 0 under a NEW fingerprint with only 10 rows: the
    # current table has 10 rows per cell -> nothing is hot
    v2 = spark.createDataFrame([(0, i) for i in range(10)], "cell INT, i INT")
    log.write_increment("pts", v2, "cell", "crawl-v2")
    assert skew.hot_cells_from_metrics(log, "pts", 0.25) == []


def test_detect_hot_cells_single_pass_over_input(spark):
    """VERDICT r05 #7: the sampled fallback decision reads its input ONCE —
    per-cell counts and the grand total come out of a single pass, with the
    total as a window sum over the already-aggregated rows (the old shape
    ran groupBy + a separate count() action = two scans). Proven with a
    row-counting accumulator on the input: exactly n rows cross it."""
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)

    def _count_rows(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    rows = [(c,) for c in [1] * 60 + [2] * 5 + [3] * 5]
    df = spark.createDataFrame(rows, "_cell INT").mapInPandas(
        _count_rows, "_cell INT"
    )
    hot = skew.detect_hot_cells(df, threshold_ratio=0.5)
    assert hot == [1]
    assert acc.value == len(rows), acc.value
