"""IVF centroid assignment must be shuffle-free on the vector side.

VERDICT r02 'What's wrong #1': the old formulation window-ranked the
|vectors| x n_centroids crossJoin fan-out — a shuffle+sort of the fan-out at
every assignment. The rewrite computes the per-row top-n with higher-order
array expressions over a broadcast codebook: the only Exchange in the whole
plan is the single-partition fold that builds the codebook array (tiny), and
no Window operator exists anywhere.
"""

import re

from pyspark.sql import Window
from pyspark.sql import functions as F

from demeter_spark.operators import simsearch

_SHUFFLE = re.compile(r"(?<!Broadcast)Exchange")


def _vectors(spark, n=40, dim=6):
    return spark.range(n).selectExpr(
        "id AS _id",
        f"transform(sequence(0, {dim - 1}), d ->"
        " CAST(1 + (id * 7 + d * 13) % 17 AS FLOAT)) AS _v",
        "CAST(id % 4 AS BIGINT) AS label",
    )


def _codebook(spark, n_cents=4, dim=6):
    return spark.range(n_cents).selectExpr(
        "id AS centroid_id",
        f"transform(sequence(0, {dim - 1}), d ->"
        " CAST(1 + (id * 3 + d * 5) % 11 AS DOUBLE)) AS centroid",
    )


def test_assignment_adds_no_exchange_and_no_window(spark):
    df = _vectors(spark).select("_id", "_v")
    cents = _codebook(spark)
    assigned = simsearch.assign_to_centroids(df, cents, "_id", 2)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # exactly ONE shuffle exchange: the single-partition codebook fold;
    # the vector side never exchanges
    assert len(_SHUFFLE.findall(plan)) == 1, plan


def test_assignment_matches_window_rank_semantics(spark):
    """Bit-for-bit the same assignments (same cosine expression, same
    ordering: cos desc, centroid_id asc) as the window formulation it
    replaced."""
    df = _vectors(spark).select("_id", "_v")
    cents = _codebook(spark)
    for top in (1, 3):
        new = {
            (r["_id"], r["centroid_id"])
            for r in simsearch.assign_to_centroids(df, cents, "_id", top).collect()
        }
        sim = F.expr(simsearch.DOT.format(a="_v", b="centroid")) / (
            F.expr(simsearch.NORM.format(a="_v"))
            * F.expr(simsearch.NORM.format(a="centroid"))
        )
        w = Window.partitionBy("_id").orderBy(F.desc("_csim"), F.asc("centroid_id"))
        old = {
            (r["_id"], r["centroid_id"])
            for r in df.crossJoin(cents)
            .withColumn("_csim", sim)
            .withColumn("_crk", F.row_number().over(w))
            .filter(F.col("_crk") <= top)
            .collect()
        }
        assert new == old
        assert len(new) == 40 * top


def test_multiprobe_pipeline_still_correct(spark):
    """ivf_multiprobe with full probing must equal brute force (the recall
    ceiling) through the rewritten assignment."""
    emb = _vectors(spark, n=60).selectExpr(
        "_id AS vec_id", "transform(_v, x -> CAST(x AS FLOAT)) AS embedding", "label"
    )
    q = emb.filter("vec_id < 5")
    brute = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in simsearch.brute_force_topk(emb, q, 5).collect()
    }
    full = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in simsearch.ivf_multiprobe_topk(emb, q, 5, n_probe=4).collect()
    }
    assert full == brute


def test_multiprobe_has_no_dedup_aggregate_and_unique_pairs(spark):
    """r07 optimization contract: candidate (query, neighbor) pairs are
    unique BY CONSTRUCTION (top-1 list assignment x distinct probed lists),
    so the plan must contain no SortAggregate/dedup of the fan-out, and the
    top-k result must still be duplicate-free."""
    emb = _vectors(spark, n=60).selectExpr(
        "_id AS vec_id", "transform(_v, x -> CAST(x AS FLOAT)) AS embedding",
        "label",
    )
    q = emb.filter("vec_id < 10")
    topk = simsearch.ivf_multiprobe_topk(emb, q, 5, n_probe=3)
    plan = topk._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan, plan
    rows = topk.collect()
    pairs = [(r["query_id"], r["neighbor_id"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    # ranks dense per query from 1
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_q.values())


def test_ivf_topk_equals_within_cell_bruteforce(spark):
    """ivf_topk (cell-pruned top-k, retired from the driver surface in the
    round-4 consolidation — subsumed there by ivf_multiprobe_topk) stays
    covered here: its result must equal a brute-force ranking restricted to
    the query's own cell."""
    emb = _vectors(spark, n=60).selectExpr(
        "_id AS vec_id", "transform(_v, x -> CAST(x AS FLOAT)) AS embedding",
        "label",
    )
    q = emb.filter("vec_id < 6")
    got = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in simsearch.ivf_topk(emb, q, 4).collect()
    }
    sim = F.expr(simsearch.DOT.format(a="_qv", b="_cv")) / (
        F.expr(simsearch.NORM.format(a="_qv"))
        * F.expr(simsearch.NORM.format(a="_cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("neighbor_id"))
    want = {
        (r["query_id"], r["neighbor_id"], r["rnk"])
        for r in q.selectExpr(
            "vec_id AS query_id", "embedding AS _qv", "label AS _l"
        )
        .join(
            emb.selectExpr(
                "vec_id AS neighbor_id", "embedding AS _cv", "label AS _l"
            ),
            "_l",
        )
        .filter("query_id != neighbor_id")
        .withColumn("_s", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 4)
        .collect()
    }
    assert got == want and len(got) > 0
