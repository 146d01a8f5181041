"""Eval-set n-gram decontamination (operators/decontaminate.py)."""

from demeter_spark.operators import decontaminate as dc


def _mk(spark, rows, idc="doc_id"):
    return spark.createDataFrame(rows, f"{idc} long, text string")


def test_contamination_pairs_and_drop(spark):
    # 5-grams for a compact fixture
    train = _mk(
        spark,
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated content about spark joins here"),
            (3, "prefix words then the quick brown fox jumps over"),
        ],
    )
    evals = _mk(
        spark,
        [(100, "the quick brown fox jumps over the lazy dog")],
        idc="eval_id",
    )
    pairs = {
        (r.doc_id, r.eval_id): (r.n_shared, r.eval_grams, r.overlap_frac)
        for r in dc.contamination_pairs(train, evals, n=5).collect()
    }
    # eval item has 9 words -> 5 distinct 5-grams; doc 1 contains all 5
    # (plus its 'tonight' tail), doc 3 shares the leading two
    assert pairs[(1, 100)][0] == 5 and pairs[(1, 100)][1] == 5
    assert abs(pairs[(1, 100)][2] - 1.0) < 1e-12
    assert pairs[(3, 100)][0] == 2  # 'the quick...jumps' and 'quick...over'
    assert (2, 100) not in pairs
    dropped = sorted(
        r.doc_id for r in dc.contaminated_ids(train, evals, n=5).collect()
    )
    assert dropped == [1, 3]
    # plan property: eval side broadcast, corpus side never shuffled on
    # grams (no non-broadcast Exchange below the gram join)
    plan = (
        dc.contamination_pairs(train, evals, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_ngram_hashes_whitespace_normalized(spark):
    """ADVICE r06: the same passage formatted with newlines/tabs instead of
    single spaces must produce identical n-gram hashes, or reformatted eval
    passages escape detection."""
    from demeter_spark.operators import decontaminate as dc

    words = " ".join(f"w{i}" for i in range(15))
    reformatted = words.replace(" w5 ", "\nw5\t").replace(" w9 ", "  w9 ")
    df = spark.createDataFrame(
        [(1, words), (2, reformatted)], "doc_id BIGINT, text STRING"
    )
    g = dc.ngram_hashes(df, n=13)
    a = {r.gh for r in g.filter("doc_id = 1").collect()}
    b = {r.gh for r in g.filter("doc_id = 2").collect()}
    assert a == b and len(a) == 3
