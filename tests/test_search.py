"""Inverted index + conjunctive search (operators/search.py)."""

from demeter_spark.operators import search as se


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the lazy dog sleeps"),
            (3, "quick dog runs fast"),
            (4, "Quick BROWN dog"),  # case folds
        ],
        "doc_id long, text string",
    )


def test_build_index_and_search(spark):
    idx = se.build_inverted_index(_corpus(spark))
    rows = {r.token: (r.df, list(r.postings)) for r in idx.collect()}
    assert rows["quick"] == (3, [1, 3, 4])
    assert rows["dog"] == (3, [2, 3, 4])
    assert rows["the"] == (2, [1, 2])
    got = sorted(
        r.doc_id
        for r in se.search_all_terms(idx, ["Quick", "dog"]).collect()
    )
    assert got == [3, 4]
    # single term
    assert sorted(
        r.doc_id for r in se.search_all_terms(idx, ["brown"]).collect()
    ) == [1, 4]
    # term absent from the corpus -> empty (conjunction fails)
    assert se.search_all_terms(idx, ["quick", "zebra"]).count() == 0


def test_max_df_cap(spark):
    idx = se.build_inverted_index(_corpus(spark), max_df=2)
    toks = {r.token for r in idx.collect()}
    assert "quick" not in toks and "dog" not in toks and "the" in toks
