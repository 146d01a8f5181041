"""segment_dedup — CCNet-style corpus-wide paragraph/segment dedup."""

from __future__ import annotations

import hashlib

import pandas as pd

from demeter_spark.operators import dedup


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def test_segment_dedup_first_occurrence_kept(spark):
    # 3-word segments; "a b c" appears in docs 0, 1, 2 — kept only in doc 0
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "a b c x y z",
                "a b c q r s",
                "m n o a b c",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.segment_dedup(df, seg_words=3).collect()
    }
    assert out[0]["n_segs"] == 2 and out[0]["n_dup_segs"] == 0
    assert out[1]["n_segs"] == 2 and out[1]["n_dup_segs"] == 1
    # doc 2's copy sits at pos 1 (not pos 0), still deduped
    assert out[2]["n_segs"] == 2 and out[2]["n_dup_segs"] == 1
    assert out[0]["dedup_fp"] == _md5("a b c x y z")
    assert out[1]["dedup_fp"] == _md5("q r s")
    assert out[2]["dedup_fp"] == _md5("m n o")


def test_segment_dedup_within_doc_repeats(spark):
    # a doc repeating its own segment keeps only the first copy
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [5], "text": ["u v w u v w u v w"]})
    )
    out = dedup.segment_dedup(df, seg_words=3).collect()[0]
    assert out["n_segs"] == 3
    assert out["n_dup_segs"] == 2
    assert out["dedup_fp"] == _md5("u v w")


def test_segment_dedup_all_dropped_doc(spark):
    # doc 1 consists entirely of doc 0's segment: empty after dedup
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["p q r s t", "p q r s t"]})
    )
    out = {
        r["doc_id"]: r for r in dedup.segment_dedup(df, seg_words=5).collect()
    }
    assert out[1]["n_dup_segs"] == 1
    assert out[1]["dedup_fp"] == _md5("")


def test_segment_dedup_ragged_tail(spark):
    # 7 words at seg_words=3 -> segments of 3, 3, 1 (tail kept as-is)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b c d e f g"]})
    )
    out = dedup.segment_dedup(df, seg_words=3).collect()[0]
    assert out["n_segs"] == 3
    assert out["dedup_fp"] == _md5("a b c d e f g")


def test_segment_dedup_shuffle_count(spark):
    import re

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "d e f"]})
    )
    plan = (
        dedup.segment_dedup(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one window shuffle (segment hash) + one reassembly groupBy
    assert len(re.findall(r"(?<!Broadcast)Exchange", plan)) <= 2
