"""Gopher-style repetition filters + CCNet-style boilerplate detection.

Pins, beyond the driver's oracle gate:
- hand-computed values on a tiny fixture (both operators),
- the short-document guard (L < n must yield empty gram lists, never the
  descending-sequence / slice(_, 0, _) failure mode),
- the scale-shape claims: repetition_stats is map-only (zero Exchange);
  boilerplate_ngrams has exactly the one gram-keyed shuffle pair plus the
  doc-side rollup.
"""

import pytest

from demeter_spark.operators.textstats import boilerplate_ngrams, repetition_stats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_repetition_stats_hand_computed(spark):
    # "a b a b a" -> bigrams: [a b, b a, a b, b a] top count 2 -> frac 4/5
    # trigrams: [a b a, b a b, a b a] -> dup positions 2 of 3
    out = {
        r["doc_id"]: r
        for r in repetition_stats(
            _docs(spark, [(1, "a b a b a"), (2, "u v w x y z")])
        ).collect()
    }
    r1 = out[1]
    assert r1["n_words"] == 5
    assert r1["top_gram_n"] == 2
    assert r1["top_gram_frac"] == pytest.approx(4 / 5)
    assert r1["dup_gram_n"] == 2  # of 3 trigram positions
    assert r1["dup_gram_frac"] == pytest.approx(2 / 3)
    assert r1["keep_repetition"] == 0  # both fractions above the gates
    r2 = out[2]  # all distinct words: top bigram occurs once
    assert r2["top_gram_n"] == 1
    assert r2["dup_gram_n"] == 0
    assert r2["keep_repetition"] == 0 if r2["top_gram_frac"] > 0.18 else 1
    assert r2["top_gram_frac"] == pytest.approx(2 / 6)


def test_repetition_stats_short_doc_guard(spark):
    """Docs shorter than the gram width: sequence(1, 0) in Spark is the
    DESCENDING [1, 0] — the operator must guard, yielding zero grams (and a
    0/0-safe dup fraction), not a slice error."""
    rows = repetition_stats(_docs(spark, [(1, "solo"), (2, "two words")])).collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[1]["top_gram_n"] == 0 and by_id[1]["dup_gram_n"] == 0
    assert by_id[1]["dup_gram_frac"] == 0.0
    assert by_id[2]["top_gram_n"] == 1  # one bigram, no trigram
    assert by_id[2]["dup_gram_n"] == 0 and by_id[2]["dup_gram_frac"] == 0.0


def test_repetition_stats_is_map_only(spark):
    """The 100 TB claim: per-doc repetition signals never leave the row —
    the optimized plan must contain NO Exchange."""
    plan = repetition_stats(
        _docs(spark, [(1, "a b c")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_boilerplate_hand_computed(spark):
    # Three docs sharing one 6-gram ("t1..t6"); doc 3 is nothing but it.
    shared = "t1 t2 t3 t4 t5 t6"
    rows = boilerplate_ngrams(
        _docs(
            spark,
            [
                (1, shared + " extra words here padding"),
                (2, "lead in words " + shared),
                (3, shared),
            ],
        ),
        n=6,
        min_docs=3,
    ).collect()
    by_id = {r["doc_id"]: r for r in rows}
    # every doc's distinct 6-grams include the shared one exactly once
    assert by_id[3]["n_grams"] == 1 and by_id[3]["n_shared"] == 1
    assert by_id[3]["shared_frac"] == 1.0 and by_id[3]["boilerplate"] == 1
    assert by_id[1]["n_shared"] == 1 and by_id[1]["boilerplate"] == 0
    assert by_id[2]["n_shared"] == 1


def test_boilerplate_short_docs_drop_out(spark):
    """Docs with fewer than n words contribute no grams and thus no output
    row (inner-join semantics, mirrored by the oracle SQL)."""
    rows = boilerplate_ngrams(
        _docs(spark, [(1, "just four words here"), (2, "a b c d e f")]), n=6
    ).collect()
    assert [r["doc_id"] for r in rows] == [2]


def test_boilerplate_single_gram_shuffle(spark):
    """Scale shape: the gram-count aggregation and the gram join hash on the
    gram key; the only exchanges in the plan are gram- or doc-keyed hash
    partitionings (no broadcast of the fact side, no range/single-partition
    exchange)."""
    plan = boilerplate_ngrams(
        _docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f")])
    )._jdf.queryExecution().executedPlan().toString()
    import re

    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert exchanges and all(e == "hashpartitioning" for e in exchanges), plan
    assert "SinglePartition" not in plan, plan


def test_fold_kernels_match_counter_on_random_docs(spark):
    """Randomized cross-check of the sorted run-length folds against
    collections.Counter (200 seeded-random docs in ONE Spark job —
    the hypothesis-style sweep batched for Spark economics)."""
    import random
    from collections import Counter

    from demeter_spark.operators.textstats import (
        _dup_positions_expr,
        _max_multiplicity_expr,
    )

    rng = random.Random(42)
    docs = []
    for i in range(200):
        n = rng.randint(0, 60)
        words = [f"w{rng.randint(0, max(1, n // 3))}" for _ in range(n)]
        docs.append((i, words))
    df = spark.createDataFrame(docs, "doc_id long, words array<string>")
    got = {
        r.doc_id: (r.m, r.d)
        for r in df.selectExpr(
            "doc_id",
            f"CAST({_max_multiplicity_expr('words')} AS INT) AS m",
            f"CAST({_dup_positions_expr('words')} AS INT) AS d",
        ).collect()
    }
    for i, words in docs:
        c = Counter(words)
        want_m = max(c.values()) if c else 0
        want_d = sum(v for v in c.values() if v > 1)
        assert got[i] == (want_m, want_d), (i, got[i], (want_m, want_d))


def test_readability_flesch(spark):
    from demeter_spark.operators.textstats import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran."),
            (2, "Antidisestablishmentarian considerations notwithstanding,"
                " multisyllabic verbosity diminishes comprehensibility."),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in readability(docs).collect()}
    assert r[1].n_sentences == 2 and r[1].n_words == 6
    # simple prose scores far higher than sesquipedalian prose
    assert r[1].flesch > 80 and r[2].flesch < 20
    # syllables never fewer than words (floor at one per word)
    assert r[2].n_syllables >= r[2].n_words


def test_compression_ratio(spark):
    from demeter_spark.operators.textstats import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam " * 400),
            (2, "The quick brown fox inspects a genuinely varied sentence"
                " with moderately unpredictable lexical content overall."),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    r = {x.doc_id: x for x in compression_ratio(docs).collect()}
    import zlib

    assert r[1].deflate_len == len(zlib.compress(("spam " * 400).encode(), 6))
    assert r[1].compression_ratio < 0.05       # repetitive -> tiny
    assert 0.3 < r[2].compression_ratio <= 1.2  # prose -> moderate
    assert r[3].raw_len == 0 and r[3].deflate_len > 0
