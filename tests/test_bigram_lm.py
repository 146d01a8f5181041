"""Corpus bigram LM + per-doc surprise (CCNet perplexity-filter analogue)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from demeter_spark.operators import textstats


def _docs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "the cat sat on the mat",
                "the cat sat on the hat",
                "the dog sat on the mat",
                "zig zag zig zag zig",
            ],
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_bigram_lm_train_counts(spark):
    df, _ = _docs(spark)
    m = {
        (r["g"]): (r["c_bg"], r["c_pre"])
        for r in textstats.bigram_lm_train(df).collect()
    }
    # "the cat" occurs in docs 0,1; prefix "the" starts 6 transitions
    # (2 per doc 0/1/2: "the cat|dog", "the mat|hat|mat")... count:
    # doc0: the->cat, the->mat; doc1: the->cat, the->hat; doc2: the->dog,
    # the->mat => c_pre("the") = 6
    assert m["the cat"] == (2, 6)
    assert m["the dog"] == (1, 6)
    assert m["the mat"] == (2, 6)
    assert m["sat on"] == (3, 3)
    assert m["zig zag"] == (2, 2)  # doc3: zig->zag x2, zig (last) no trans
    assert m["zag zig"] == (2, 2)


def test_bigram_surprise_self_scoring(spark):
    df, pdf = _docs(spark)
    out = {
        r["doc_id"]: r.asDict()
        for r in textstats.bigram_surprise(df, k=3).collect()
    }
    # every doc's transitions all scored (self-scoring: no OOV drop)
    for d, txt in zip(pdf["doc_id"], pdf["text"]):
        assert out[d]["lm_n_trans"] == len(txt.split()) - 1
    # with k=3: improbable iff c_bg*3 < c_pre. "the X" grams: c_pre=6 ->
    # improbable iff c_bg < 2, i.e. only "the dog"/"the hat" (c_bg=1).
    # doc0 "the cat sat on the mat": the->cat(2*3>=6 not), cat->sat(1*3>=1),
    # sat->on(3,3), on->the(3,3), the->mat(2) => 0 improbable
    assert out[0]["lm_n_improbable"] == 0
    # doc1 has the->hat (c_bg=1, 3 < 6): 1 improbable
    assert out[1]["lm_n_improbable"] == 1
    assert out[2]["lm_n_improbable"] == 1  # the->dog
    assert out[3]["lm_n_improbable"] == 0  # zig/zag transitions all frequent
    assert out[1]["lm_improbable_frac"] == 1.0 / 5.0
    assert all(v["keep_lm"] == 1 for v in out.values())


def test_bigram_surprise_held_out_model(spark):
    """Scoring a new doc under a model trained elsewhere: OOV transitions
    drop from the inner join (documented vocabulary semantics)."""
    train, _ = _docs(spark)
    model = textstats.bigram_lm_train(train)
    new = spark.createDataFrame(
        pd.DataFrame({"doc_id": [9], "text": ["the cat ate a fish"]})
    )
    out = textstats.bigram_surprise(new, model=model).collect()
    assert len(out) == 1
    # only "the cat" is in-vocabulary among the 4 transitions
    assert out[0]["lm_n_trans"] == 1


def test_bigram_surprise_broadcast_plan(spark):
    df, _ = _docs(spark)
    out = textstats.bigram_surprise(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # shuffle-join fallback for adversarial vocabularies
    out2 = textstats.bigram_surprise(df, broadcast_model=False)
    rows = {r["doc_id"]: r["lm_n_trans"] for r in out2.collect()}
    assert rows == {
        r["doc_id"]: r["lm_n_trans"] for r in out.collect()
    }
