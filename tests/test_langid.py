"""Cavnar-Trenkle language ID vs a pure-Python reference: exact profile
parity, exact out-of-place score parity, and held-out classification."""

import collections

import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import langid

SEED = [
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "this is the house that jack built and the cat sat on the mat"),
    ("en", "she sells sea shells by the sea shore with the other children"),
    ("fr", "le renard brun saute par dessus le chien paresseux pres de la riviere"),
    ("fr", "voici la maison que jacques a construite et le chat sur le tapis"),
    ("fr", "elle vend des coquillages au bord de la mer avec les autres enfants"),
    ("de", "der schnelle braune fuchs springt ueber den faulen hund am fluss"),
    ("de", "das ist das haus das jakob gebaut hat und die katze auf der matte"),
    ("de", "sie verkauft muscheln am ufer des meeres mit den anderen kindern"),
]

HELD_OUT = [
    ("h1", "the dog and the cat were near the house by the river", "en"),
    ("h2", "le chien et le chat sont pres de la maison au bord de la riviere", "fr"),
    ("h3", "der hund und die katze sind am haus am ufer des flusses", "de"),
    ("h4", "", "und"),
]

N, TOP_K = 3, 60


def _grams(text, n=N):
    t = " " + " ".join(text.lower().split()) + " "
    if len(t) < n:
        return []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def _rank(counter, top_k):
    items = sorted(counter.items(), key=lambda kv: (-kv[1], kv[0]))
    return {g: i + 1 for i, (g, _) in enumerate(items[:top_k])}


def _ref_profiles():
    by_lang = collections.defaultdict(collections.Counter)
    for lang, text in SEED:
        by_lang[lang].update(_grams(text))
    return {lang: _rank(c, TOP_K) for lang, c in by_lang.items()}


def _ref_classify(text, profiles):
    doc = _rank(collections.Counter(_grams(text)), TOP_K)
    if not doc:
        return "und", None
    scores = {
        lang: sum(
            abs(dr - prof[g]) if g in prof else TOP_K
            for g, dr in doc.items()
        )
        for lang, prof in profiles.items()
    }
    return min(scores.items(), key=lambda kv: (kv[1], kv[0]))


@pytest.fixture(scope="module")
def seed_df(spark):
    return spark.createDataFrame(SEED, "lang string, text string")


@pytest.fixture(scope="module")
def profiles(spark, seed_df):
    return langid.train_profiles(seed_df, n=N, top_k=TOP_K).cache()


def test_profiles_match_reference(spark, profiles):
    got = collections.defaultdict(dict)
    for r in profiles.collect():
        got[r["lang"]][r["gram"]] = r["rank"]
    assert dict(got) == _ref_profiles()


def test_out_of_place_scores_match_reference(spark, profiles):
    # empty text excluded here: scores only exist for gram-bearing docs
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT if t], "doc_id string, text string"
    )
    got = {
        r["doc_id"]: (r["lang"], r["oop_distance"])
        for r in langid.classify(docs, profiles, n=N, top_k=TOP_K).collect()
    }
    ref = _ref_profiles()
    for i, t, _ in HELD_OUT:
        if t:
            lang, score = _ref_classify(t, ref)
            assert got[i] == (lang, score), i


def test_held_out_classification_and_und(spark, profiles):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id string, text string"
    )
    out = langid.classify(docs, profiles, n=N, top_k=TOP_K)
    got = {r["doc_id"]: r["lang"] for r in out.collect()}
    assert got == {i: want for i, _, want in HELD_OUT}
    und = [r for r in out.collect() if r["lang"] == "und"][0]
    assert und["oop_distance"] is None and und["n_doc_grams"] == 0


def test_classify_plan_broadcasts_profiles(spark, profiles):
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id string, text string"
    )
    plan = (
        langid.classify(docs, profiles, n=N, top_k=TOP_K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the language cross and profile joins must be broadcast; the only
    # allowed shuffle join is the und-reattachment anti-join, which is
    # fact-vs-fact on doc_id (both sides already keyed by it)
    assert "BroadcastNestedLoopJoin" in plan  # langs cross
    assert "BroadcastHashJoin" in plan  # profiles
    assert plan.count("SortMergeJoin") <= 1
