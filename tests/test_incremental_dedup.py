"""Incremental (continuous-crawl) MinHash dedup over lineage state:
the union of per-increment pairs must equal the batch result, each pair
discovered exactly once, and re-running an increment must be idempotent."""

from pyspark.sql import functions as F

from demeter_spark.operators import dedup
from demeter_spark.plans.lineage import LineageLog
from demeter_spark.sources import synth
from tests.conftest import SF_DIR


def _pair_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 12)) for r in df.collect()
    }


def test_incremental_equals_batch_and_exactly_once(spark, tmp_path):
    corpus = synth.dedup_corpus(spark, SF_DIR).persist()
    batch = _pair_set(dedup.minhash_lsh_pairs(corpus, 0.8))
    assert batch, "fixture must contain engineered near-dups"

    log = LineageLog(spark, str(tmp_path / "dedup_state"))
    # three increments that interleave near-dup partners across increments:
    # originals (doc_id < 100000) arrive first, variants + exact dups later,
    # so most pairs span increments (the new x old path is load-bearing)
    incs = [
        corpus.filter("doc_id < 100000 AND doc_id % 2 = 0"),
        corpus.filter("doc_id < 100000 AND doc_id % 2 = 1").unionByName(
            corpus.filter("doc_id >= 200000")
        ),
        corpus.filter("doc_id >= 100000 AND doc_id < 200000"),
    ]
    got = set()
    per_inc = []
    for i, inc in enumerate(incs):
        pairs = _pair_set(
            dedup.incremental_minhash_pairs(log, inc, i, 0.8)
        )
        per_inc.append(pairs)
        assert not (pairs & got), "a pair must be emitted exactly once"
        got |= pairs
    assert got == batch

    # crash-recovery: re-running the LATEST increment recommits nothing
    # (idempotent partitions) and reproduces its pairs exactly
    again = _pair_set(
        dedup.incremental_minhash_pairs(log, incs[2], 2, 0.8)
    )
    assert again == per_inc[2]
    # replaying an OLDER increment after later arrivals re-discovers pairs
    # whose partner arrived later — a superset, never a loss (near-dup
    # pairs are idempotent facts; exactly-once holds on the forward path)
    old_again = _pair_set(
        dedup.incremental_minhash_pairs(log, incs[1], 1, 0.8)
    )
    assert old_again >= per_inc[1]
    corpus.unpersist()


def test_streaming_dedup_equals_batch(spark, tmp_path):
    """Two file arrivals through the AvailableNow stream: the union of
    emitted pair batches equals batch MinHash over the full corpus."""
    from demeter_spark.streaming.incremental import streaming_dedup

    corpus = synth.dedup_corpus(spark, SF_DIR).persist()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    corpus.filter("doc_id < 100000").write.mode("append").parquet(in_dir)
    streaming_dedup(spark, in_dir, out_dir, ckpt, state)
    corpus.filter("doc_id >= 100000").write.mode("append").parquet(in_dir)
    streaming_dedup(spark, in_dir, out_dir, ckpt, state)

    got = _pair_set(spark.read.parquet(out_dir))
    batch = _pair_set(dedup.minhash_lsh_pairs(corpus, 0.8))
    assert got == batch
    # a third run with nothing new arrives at the committed offsets and
    # emits nothing
    streaming_dedup(spark, in_dir, out_dir, ckpt, state)
    assert _pair_set(spark.read.parquet(out_dir)) == batch
    corpus.unpersist()


def _cpair_set(df):
    return {
        (r["doc_a"], r["doc_b"], round(r["containment"], 12))
        for r in df.collect()
    }


def test_incremental_containment_equals_batch(spark, tmp_path):
    """VERDICT r04 #5: the winnowing/containment analogue of the MinHash
    incremental path. With max_df=None the per-pair score is independent of
    when the pair completes, so the union over increments must equal batch
    containment_pairs over the full corpus, each ordered pair emitted by
    exactly one increment (the one that completed it)."""
    corpus = synth.dedup_corpus(spark, SF_DIR).persist()
    batch = _cpair_set(dedup.containment_pairs(corpus, 0.5, max_df=None))
    assert batch, "fixture must contain engineered containment pairs"

    log = LineageLog(spark, str(tmp_path / "containment_state"))
    incs = [
        corpus.filter("doc_id < 100000 AND doc_id % 2 = 0"),
        corpus.filter("doc_id < 100000 AND doc_id % 2 = 1").unionByName(
            corpus.filter("doc_id >= 200000")
        ),
        corpus.filter("doc_id >= 100000 AND doc_id < 200000"),
    ]
    got = set()
    per_inc = []
    for i, inc in enumerate(incs):
        pairs = _cpair_set(
            dedup.incremental_containment_pairs(log, inc, i, 0.5, max_df=None)
        )
        per_inc.append(pairs)
        assert not (pairs & got), "an ordered pair must be emitted once"
        got |= pairs
    assert got == batch

    # crash recovery: replaying the LATEST increment is idempotent
    again = _cpair_set(
        dedup.incremental_containment_pairs(log, incs[2], 2, 0.5, max_df=None)
    )
    assert again == per_inc[2]
    # replaying an OLDER increment re-discovers pairs whose partner arrived
    # later — a superset, never a loss
    old_again = _cpair_set(
        dedup.incremental_containment_pairs(log, incs[1], 1, 0.5, max_df=None)
    )
    assert old_again >= per_inc[1]
    corpus.unpersist()


def test_incremental_containment_df_cap_bounded(spark, tmp_path):
    """With the boilerplate cap on, the probe join stays bounded and the
    increments still partition the discovery (no double emission); scores
    reflect document frequencies at completion time (documented monotone
    semantics), so only disjointness — not batch equality — is asserted."""
    corpus = synth.dedup_corpus(spark, SF_DIR).persist()
    log = LineageLog(spark, str(tmp_path / "containment_capped"))
    first = _cpair_set(
        dedup.incremental_containment_pairs(
            log, corpus.filter("doc_id < 100000"), 0, 0.5
        )
    )
    second = _cpair_set(
        dedup.incremental_containment_pairs(
            log, corpus.filter("doc_id >= 100000"), 1, 0.5
        )
    )
    emitted_pairs = {(a, b) for a, b, _ in first} & {(a, b) for a, b, _ in second}
    assert not emitted_pairs
    assert first or second
    corpus.unpersist()


def test_streaming_containment_equals_batch(spark, tmp_path):
    """Two file arrivals through the AvailableNow stream: the union of
    emitted ordered containment pairs equals batch containment_pairs over
    the full corpus; a third run with nothing new emits nothing."""
    from demeter_spark.streaming.incremental import streaming_containment

    corpus = synth.dedup_corpus(spark, SF_DIR).persist()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    corpus.filter("doc_id < 100000").write.mode("append").parquet(in_dir)
    streaming_containment(spark, in_dir, out_dir, ckpt, state)
    corpus.filter("doc_id >= 100000").write.mode("append").parquet(in_dir)
    streaming_containment(spark, in_dir, out_dir, ckpt, state)

    got = _cpair_set(spark.read.parquet(out_dir))
    batch = _cpair_set(dedup.containment_pairs(corpus, 0.5, max_df=None))
    assert got == batch
    streaming_containment(spark, in_dir, out_dir, ckpt, state)
    assert _cpair_set(spark.read.parquet(out_dir)) == batch
    corpus.unpersist()


# ----------------------------------------------- incremental segment dedup


def _seg_rows(df):
    return {
        (r["doc_id"], r["n_segs"], r["n_dup_segs"], r["dedup_fp"])
        for r in df.collect()
    }


def test_incremental_segment_dedup_equals_batch(spark, tmp_path):
    import pandas as pd

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3, 4, 5],
                "text": [
                    "a b c x y z",          # inc 0
                    "a b c q r s",          # inc 0: dup of doc 0's first seg
                    "m n o a b c",          # inc 1: cross-increment dup
                    "m n o m n o",          # inc 1: dup of doc 2 + self-dup
                    "q r s fresh words",    # inc 2: dup of doc 1's tail
                    "all new tokens here",  # inc 2
                ],
            }
        )
    )
    batch = _seg_rows(dedup.segment_dedup(corpus, seg_words=3))

    from demeter_spark.plans.lineage import LineageLog

    log = LineageLog(spark, str(tmp_path / "seg_state"))
    incs = [
        corpus.filter("doc_id < 2"),
        corpus.filter("doc_id IN (2, 3)"),
        corpus.filter("doc_id >= 4"),
    ]
    got = set()
    for i, inc in enumerate(incs):
        got |= _seg_rows(
            dedup.incremental_segment_dedup(log, inc, i, seg_words=3)
        )
    assert got == batch

    # idempotent replay: re-running increment 1 after its commit yields
    # byte-identical per-doc rows (the probe is blind to its own buckets)
    replay = _seg_rows(
        dedup.incremental_segment_dedup(log, incs[1], 1, seg_words=3)
    )
    assert replay == {r for r in batch if r[0] in (2, 3)}


def test_incremental_segment_dedup_empty_increment(spark, tmp_path):
    import pandas as pd

    from demeter_spark.plans.lineage import LineageLog

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["p q r"]})
    )
    log = LineageLog(spark, str(tmp_path / "seg_state2"))
    dedup.incremental_segment_dedup(log, corpus, 0, seg_words=3).collect()
    out = dedup.incremental_segment_dedup(
        log, corpus.limit(0), 1, seg_words=3
    ).collect()
    assert out == []


def test_streaming_segment_dedup_equals_batch(spark, tmp_path):
    """Two doc-ordered file arrivals through the AvailableNow stream: the
    union of per-batch per-doc rows equals batch segment_dedup; a third
    run with nothing new emits no new batch partitions."""
    import pandas as pd

    from demeter_spark.streaming.incremental import streaming_segment_dedup

    corpus = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "alpha beta gamma one two three",
                    "alpha beta gamma four five six",
                    "four five six seven eight nine",
                    "totally fresh words only here now",
                ],
            }
        )
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    corpus.filter("doc_id < 2").write.mode("append").parquet(in_dir)
    streaming_segment_dedup(spark, in_dir, out_dir, ckpt, state, seg_words=3)
    corpus.filter("doc_id >= 2").write.mode("append").parquet(in_dir)
    streaming_segment_dedup(spark, in_dir, out_dir, ckpt, state, seg_words=3)

    got = _seg_rows(spark.read.parquet(out_dir).drop("batch_id"))
    batch = _seg_rows(dedup.segment_dedup(corpus, seg_words=3))
    assert got == batch
    streaming_segment_dedup(spark, in_dir, out_dir, ckpt, state, seg_words=3)
    assert _seg_rows(spark.read.parquet(out_dir).drop("batch_id")) == batch
