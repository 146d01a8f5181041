"""End-to-end curate() pipeline over the sf0.001 documents table:
composition consistency (each flag equals its standalone operator), the
final keep conjunction, determinism under repartitioning, and the
language-gated variant."""

import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import curation, langid, textstats
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def curated(spark, docs):
    return curation.curate(docs).cache()


def test_total_and_unique(spark, docs, curated):
    n = docs.count()
    assert curated.count() == n
    assert curated.select("doc_id").distinct().count() == n


def test_keep_is_conjunction(curated):
    bad = curated.filter(
        F.col("keep")
        != (
            (F.col("keep_quality") == 1)
            & (F.col("keep_repetition") == 1)
            & (F.col("keep_lm") == 1)
            & (F.col("keep_lang") == 1)
            & (F.col("keep_neardup") == 1)
        ).cast("int")
    )
    assert bad.count() == 0
    # the pipeline must actually gate something and pass something
    kept = curated.filter("keep = 1").count()
    assert 0 < kept < curated.count()


def test_flags_match_standalone_operators(spark, docs, curated):
    q = {
        r["doc_id"]: r["keep"]
        for r in textstats.quality_flags(docs).collect()
    }
    got = {
        r["doc_id"]: (r["keep_quality"], r["keep_neardup"], r["neardup_cluster"])
        for r in curated.collect()
    }
    assert all(q[i] == kq for i, (kq, _, _) in got.items())
    # canonical flag: keep_neardup == 1 iff the doc is its cluster's rep
    assert all(
        (i == cl) == bool(kn) for i, (_, kn, cl) in got.items()
    )


def test_split_deterministic_and_total(spark, docs, curated):
    splits = dict(
        curated.groupBy("split").count().collect()
    ) if False else {
        r["split"]: r["count"]
        for r in curated.groupBy("split").count().collect()
    }
    assert set(splits) <= {"train", "valid", "test"}
    assert sum(splits.values()) == docs.count()
    assert splits["train"] > splits.get("valid", 0)
    # determinism under physical layout changes
    again = curation.curate(docs.repartition(13)).select(
        "doc_id", "split", "keep"
    )
    a = {r["doc_id"]: (r["split"], r["keep"]) for r in again.collect()}
    b = {
        r["doc_id"]: (r["split"], r["keep"])
        for r in curated.select("doc_id", "split", "keep").collect()
    }
    assert a == b


def test_language_gate(spark, docs):
    seed = [
        ("en", "the cat and the dog are in the house with the children"),
        ("en", "this is a story of the sea and the ships that sail it"),
        ("xx", "zqx vwk qqz xxv wkz qzx vkw zzq xwv kqz zxq wvk"),
    ]
    profiles = langid.train_profiles(
        docs.sparkSession.createDataFrame(seed, "lang string, text string"),
        n=3,
        top_k=80,
    )
    out = curation.curate(
        docs.limit(50), lang_profiles=profiles, keep_langs=("en",)
    )
    rows = out.select("lang_id", "keep_lang").collect()
    assert all(r["lang_id"] in ("en", "xx") for r in rows)
    assert all(
        (r["lang_id"] == "en") == bool(r["keep_lang"]) for r in rows
    )


def test_fence_blocks_pushdown_blowup(spark, docs, curated):
    """Filtering the decision frame on keep flags must NOT re-expand the
    O(L^2) signal expressions into pushed Filters (plans/fence.py; the
    unfenced plan carried 7 copies of the top-gram array_max kernel and
    ran 21x slower). Pin both the plan property and value parity."""
    filtered = curation.curate(docs).filter("keep = 1")
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    # every expensive kernel stays inside a Generate struct: no Filter
    # line may embed the top-gram scan
    for line in plan.splitlines():
        if line.lstrip().startswith(("Filter", "+- Filter", ":- Filter")):
            assert "array_max" not in line, line[:200]
    assert plan.count("Generate explode") >= 3  # quality, repetition, pii
    # value parity with the filter applied post-hoc (no pushdown possible)
    want = sorted(
        r.doc_id for r in curated.collect() if r.keep == 1
    )
    got = sorted(r.doc_id for r in filtered.select("doc_id").collect())
    assert got == want and len(got) > 0


def test_short_docs_get_decision_rows(spark):
    """ADVICE r06 (medium): docs with < 2 words (no bigram transitions)
    must still surface one decision row — keep_lm defaults to 1 (no
    evidence), lm_n_trans to 0 — instead of vanishing through the former
    inner join."""
    df = spark.createDataFrame(
        [
            (1, "one"),
            (2, ""),
            (3, "a perfectly ordinary document with several words in it"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = curation.curate(df).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {1, 2, 3}
    for i in (1, 2):
        assert by_id[i].lm_n_trans == 0
        assert by_id[i].keep_lm == 1
        assert by_id[i].keep is not None
