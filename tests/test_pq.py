"""Product-quantization (IVF-PQ) tests.

Exactness lever: build docs whose subvectors are EXACTLY codebook centroids
(codes = base-8 digits of the id, centroid values distinct per (sub, code)).
Then PQ reconstruction is exact, so encode must recover the digits, pq_norm
must equal the true vector norm, and ADC ordering must match exact cosine
ordering. Reference anchor: the reference has no ANN surface at all
(demeter/db.py query layer is exact SQL) — this is beyond-reference scale
tooling; semantics follow Jegou/Douze/Schmid 2011 (public knowledge).
"""

import math
import re

import pytest

from demeter_spark.operators import simsearch

M, K, DSUB = 4, 8, 2  # 4 subspaces x 8 codes, 2 dims each -> dim 8
_SHUFFLE = re.compile(r"(?<!Broadcast)Exchange")


def _docs(spark, n=40):
    # subvector s of doc id is centroid ((id >> 3s) & 7) of subspace s
    return spark.range(n).selectExpr(
        "id AS vec_id",
        "CAST(id % 3 AS BIGINT) AS label",
        f"flatten(transform(sequence(0, {M - 1}), s -> "
        f"transform(sequence(0, {DSUB - 1}), d -> CAST("
        "1 + s * 50 + ((CAST(shiftright(id, 3 * s) AS INT) & 7)) * 3 + d"
        " AS FLOAT)))) AS embedding",
    )


def _book(spark):
    return spark.range(M * K).selectExpr(
        f"CAST(id / {K} AS INT) AS sub",
        f"CAST(id % {K} AS INT) AS code",
        f"transform(sequence(0, {DSUB - 1}), d -> "
        f"CAST(1 + CAST(id / {K} AS INT) * 50 + (id % {K}) * 3 + d AS DOUBLE)"
        ") AS centroid",
    )


def _expected_codes(i):
    return [(i >> (3 * s)) & 7 for s in range(M)]


def test_pq_encode_recovers_exact_codes_and_norm(spark):
    enc = {
        r["vec_id"]: (list(r["codes"]), r["pq_norm"])
        for r in simsearch.pq_encode(_docs(spark), _book(spark), m=M).collect()
    }
    assert len(enc) == 40
    for i in range(40):
        codes, pq_norm = enc[i]
        assert codes == _expected_codes(i), i
        true_norm = math.sqrt(
            sum(
                (1 + s * 50 + codes[s] * 3 + d) ** 2
                for s in range(M)
                for d in range(DSUB)
            )
        )
        assert pq_norm == pytest.approx(true_norm, rel=1e-12), i


def test_pq_encode_plan_no_window_no_vector_shuffle(spark):
    enc = simsearch.pq_encode(_docs(spark), _book(spark), m=M)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # only the tiny codebook fold exchanges (2 groupBys); the vector side never does
    assert len(_SHUFFLE.findall(plan)) <= 2, plan


def test_pq_dims_rejects_indivisible(spark):
    with pytest.raises(ValueError, match="not divisible"):
        simsearch.train_pq(_docs(spark), m=3)


def test_train_pq_full_codebook_and_valid_codes(spark):
    book = simsearch.train_pq(_docs(spark), m=M, k=K, n_iter=1)
    rows = book.collect()
    assert {(r["sub"], r["code"]) for r in rows} == {
        (s, c) for s in range(M) for c in range(K)
    }
    assert all(len(r["centroid"]) == DSUB for r in rows)
    enc = simsearch.pq_encode(_docs(spark), book, m=M).collect()
    assert all(0 <= c < K for r in enc for c in r["codes"])


def test_ivfpq_adc_recall_is_exact_on_codebook_vectors(spark):
    """Reconstruction-exact corpus + all lists probed -> ADC ordering must
    reproduce the exact top-k pair set (recall 1.0) without any re-rank."""
    docs = _docs(spark)
    queries = docs.limit(5)
    approx = simsearch.ivfpq_topk(
        docs, queries, k=3, n_probe=3, m=M, codebook=_book(spark)
    )
    exact = simsearch.brute_force_topk(docs, queries, k=3)
    assert simsearch.recall_at_k(approx, exact) == 1.0


def test_ivfpq_rerank_equals_bruteforce_rows(spark):
    """With every list probed and a shortlist covering the whole corpus, the
    exact re-rank stage must emit bit-identical rows to brute force (same
    _cos text, same _ranked window) even under a TRAINED (lossy) codebook."""
    docs = _docs(spark)
    queries = docs.limit(4)
    book = simsearch.train_pq(docs, m=M, k=4, n_iter=1)
    got = sorted(
        map(
            tuple,
            simsearch.ivfpq_topk(
                docs, queries, k=3, n_probe=3, m=M, codebook=book, re_rank=50
            ).collect(),
        )
    )
    want = sorted(map(tuple, simsearch.brute_force_topk(docs, queries, k=3).collect()))
    assert got == want
