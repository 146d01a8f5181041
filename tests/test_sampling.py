"""Deterministic split assignment + stratified hash sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from demeter_spark.operators import sampling
from tests.conftest import SF_DIR


def _docs(spark, n=4000):
    pdf = pd.DataFrame(
        {
            "url": [f"https://site{i % 37}.example/p/{i}" for i in range(n)],
            "doc_id": np.arange(n, dtype=np.int64),
            "lang": np.where(
                np.arange(n) % 10 < 7, "en", np.where(np.arange(n) % 10 < 9, "fr", "de")
            ),
        }
    )
    return spark.createDataFrame(pdf).repartition(8), pdf


def test_split_assign_deterministic_and_proportional(spark):
    df, _ = _docs(spark)
    out = sampling.split_assign(df).toPandas()
    again = sampling.split_assign(df.repartition(3)).toPandas()
    a = out.sort_values("doc_id")["split"].to_numpy()
    b = again.sort_values("doc_id")["split"].to_numpy()
    # identical assignment regardless of partitioning/run
    assert np.array_equal(a, b)
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.90) < 0.03
    assert abs(frac["valid"] - 0.05) < 0.02
    assert abs(frac["test"] - 0.05) < 0.02


def test_split_keyed_on_url_survives_renumbering(spark):
    df, pdf = _docs(spark)
    out1 = sampling.split_assign(df).toPandas().set_index("url")["split"]
    renum = spark.createDataFrame(
        pdf.assign(doc_id=pdf["doc_id"].to_numpy()[::-1].copy())
    )
    out2 = sampling.split_assign(renum).toPandas().set_index("url")["split"]
    # same url -> same split even when doc_ids are reassigned
    assert (out1.sort_index() == out2.sort_index()).all()


def test_split_salt_changes_assignment(spark):
    df, _ = _docs(spark, n=1000)
    a = sampling.split_assign(df, salt="a").toPandas().set_index("url")["split"]
    b = sampling.split_assign(df, salt="b").toPandas().set_index("url")["split"]
    assert (a.sort_index() != b.sort_index()).any()


def test_split_matches_duckdb_oracle(spark, ddb):
    df, pdf = _docs(spark, n=1500)
    got = (
        sampling.split_assign(df, key_col="doc_id")
        .toPandas()
        .sort_values("doc_id")["split"]
        .to_numpy()
    )
    ddb.register("samp_docs", pdf)
    case = sampling.split_assign_oracle_case(key_col="doc_id")
    want = (
        ddb.sql(f"SELECT doc_id, {case} AS split FROM samp_docs ORDER BY doc_id")
        .df()["split"]
        .to_numpy()
    )
    assert np.array_equal(got, want)


def test_stratified_sample_membership_and_rates(spark, ddb):
    df, pdf = _docs(spark)
    fr = {"en": 0.25, "fr": 1.0}
    out = sampling.stratified_sample(df, fr).toPandas()
    # de default_fraction=0 -> excluded entirely; fr kept entirely
    assert set(out["lang"]) == {"en", "fr"}
    assert (out["lang"] == "fr").sum() == (pdf["lang"] == "fr").sum()
    en_rate = (out["lang"] == "en").sum() / (pdf["lang"] == "en").sum()
    assert abs(en_rate - 0.25) < 0.05
    # per-row membership matches the DuckDB mirror exactly
    ddb.register("samp_docs2", pdf)
    b = sampling.sampling_oracle_bucket("url", "sample-v1")
    want = ddb.sql(
        f"""SELECT url FROM samp_docs2 WHERE {b} < (CASE
             WHEN lang = 'en' THEN {int(0.25 * (1 << 32))}
             WHEN lang = 'fr' THEN {1 << 32} ELSE 0 END)
            ORDER BY url"""
    ).df()["url"].to_numpy()
    assert np.array_equal(np.sort(out["url"].to_numpy()), want)


def test_sampling_is_map_only(spark):
    pdf = pd.DataFrame(
        {"url": [f"u{i}" for i in range(200)], "lang": ["en"] * 200}
    )
    df = spark.createDataFrame(pdf)
    plan = (
        sampling.stratified_sample(df, {"en": 0.5})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pack_sequences_greedy_semantics(spark, ddb):
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(3000, dtype=np.int64),
            "n_tokens": (np.arange(3000) % 700 + 50).astype(np.int64),
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    out = sampling.pack_sequences(df, budget=2048, n_groups=16).toPandas()
    # every doc assigned exactly one pack; assignment deterministic
    again = sampling.pack_sequences(
        spark.createDataFrame(pdf).repartition(3), budget=2048, n_groups=16
    ).toPandas()
    a = out.sort_values("doc_id")["pack_id"].to_numpy()
    b = again.sort_values("doc_id")["pack_id"].to_numpy()
    assert np.array_equal(a, b)
    # within each group, packs are the greedy cumsum partition: no pack
    # except possibly a group's last starts beyond the budget boundary
    # rule, and pack indexes are nondecreasing in doc order
    for gid, grp in out.sort_values("doc_id").groupby("pack_group"):
        run = 0
        prev_pack = -1
        for t, p in zip(grp["n_tokens"], grp["pack_id"]):
            assert p >= prev_pack
            assert (p & ((1 << 40) - 1)) == run // 2048
            run += t
            prev_pack = p
    # DuckDB window mirror agrees exactly (DuckDB's hash() differs from
    # xxhash64, so the Spark-side grouping is exported and the window
    # re-evaluated over it)
    ddb.register("pack_docs", pdf)
    got_groups = out[["doc_id", "pack_group"]]
    ddb.register("spark_groups", got_groups)
    want2 = ddb.sql(
        """
        SELECT d.doc_id,
               sg.pack_group * 1099511627776
               + ((sum(d.n_tokens) OVER (PARTITION BY sg.pack_group
                     ORDER BY d.doc_id ROWS UNBOUNDED PRECEDING)
                   - d.n_tokens) // 2048) AS pack_id
        FROM pack_docs d JOIN spark_groups sg USING (doc_id)
        ORDER BY d.doc_id
        """
    ).df()
    assert np.array_equal(a, want2["pack_id"].to_numpy())


def test_pack_sequences_oversized_doc_gets_own_packs(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "n_tokens": [100, 5000, 100],  # doc 1 alone exceeds the budget
        }
    )
    out = (
        sampling.pack_sequences(
            spark.createDataFrame(pdf), budget=1024, n_groups=1
        )
        .toPandas()
        .sort_values("doc_id")
    )
    packs = out["pack_id"].to_numpy()
    # doc 1 starts at offset 100 -> pack 0; doc 2 starts at 5100 -> pack 4:
    # the oversized doc consumed packs 0-4 but didn't stall the stream
    assert packs[0] == packs[1]
    assert packs[2] - packs[0] == 4


def test_domain_quota_oracle_and_stability(spark, ddb):
    from demeter_spark.operators.sampling import (
        domain_quota,
        sampling_oracle_bucket,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in domain_quota(docs, 10, "source", "doc_id").collect()
    )
    b = sampling_oracle_bucket("doc_id", "quota-v1")
    want = sorted(
        r[0]
        for r in ddb.sql(
            f"""
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY source ORDER BY {b}, doc_id) AS rk
          FROM documents)
        WHERE rk <= 10
        """
        ).fetchall()
    )
    assert got == want
    # per-domain cap holds and big domains are actually capped
    caps = {
        r["source"]: r["n"]
        for r in domain_quota(docs, 10, "source", "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert max(caps.values()) <= 10
    full = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert any(v > 10 for v in full.values())  # fixture exercises the cap
    # layout-independence: same winners after a repartition
    again = sorted(
        r["doc_id"]
        for r in domain_quota(
            docs.repartition(17), 10, "source", "doc_id"
        ).collect()
    )
    assert again == got


def test_temperature_weights_and_mixture_sample(spark):
    from demeter_spark.operators.sampling import (
        mixture_sample,
        temperature_weights,
    )

    docs = spark.range(0, 1300).selectExpr(
        "CAST(id AS STRING) AS url",
        "CASE WHEN id < 1000 THEN 'big' WHEN id < 1250 THEN 'mid'"
        " ELSE 'small' END AS source",
        "id",
    )
    w = {r.domain: r for r in temperature_weights(docs, 0.5).collect()}
    import math

    z = math.sqrt(1000) + math.sqrt(250) + math.sqrt(50)
    for d, n in (("big", 1000), ("mid", 250), ("small", 50)):
        assert abs(w[d].weight - math.sqrt(n) / z) < 1e-12
        assert abs(
            w[d].keep_fraction - min(1.0, math.sqrt(n) / z * 1300 / n)
        ) < 1e-12
    # alpha < 1 upweights small domains relative to natural sampling
    assert w["small"].keep_fraction > w["big"].keep_fraction
    kept = mixture_sample(docs, 0.5).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in kept}
    # deterministic: exact same rows on re-run
    kept2 = mixture_sample(docs, 0.5).groupBy("source").count().collect()
    assert got == {r.source: r["count"] for r in kept2}
    # realized counts near n * keep_fraction (md5 buckets are uniform)
    for d, n in (("big", 1000), ("mid", 250), ("small", 50)):
        expect = n * w[d].keep_fraction
        assert abs(got.get(d, 0) - expect) < max(12, 0.25 * expect), (d, got)
