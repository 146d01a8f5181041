"""Optimization-round measurement harness (guide §1) — NOT the driver bench.

bench.py is frozen for measurement; this file exists so the round can
(a) isolate each bench query with the noop sink (§1.4: every column of every
    row computed, no sink cost, no count-pruning),
(b) capture .explain("formatted") for the before/after plan evidence in
    plans/r07/, and
(c) time sub-stages (cover build vs join vs refine, etc.) with job labels.

Usage:
    python bench_extra.py plans before      # write plans/r07/*_before.txt
    python bench_extra.py plans after       # write plans/r07/*_after.txt
    python bench_extra.py time [qname ...]  # noop-sink timings, best of N
    python bench_extra.py stages            # per-stage isolation timings

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, DEMETER_BENCH_FACTOR — same
contract as bench.py so numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def build_queries(spark, sf_dir: str, factor: int, res: int):
    """The same seven query DataFrames bench.py counts, as lazy builders."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import dedup, joins, simsearch, zonal
    from demeter_spark.sources import synth

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    pts = synth.scaled_page_points(spark, sf_dir, factor)
    par = synth.parcels(spark)
    pages = synth.pages(spark, sf_dir)
    base_pts = synth.page_points(spark, sf_dir)
    corpus = synth.dedup_corpus(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        max(cpus, 8)
    )
    n_emb = emb.count()
    n_lists = max(8, int(n_emb**0.5))
    emb = emb.withColumn(
        "ivf_cell", F.pmod(F.xxhash64("vec_id"), F.lit(n_lists))
    )
    return {
        "q1_spatial_join": lambda: joins.spatial_join(pts, par, res=res),
        "q4_zonal": lambda: zonal.zonal_stats(
            synth.raster_cells(spark), synth.parcels(spark)
        ),
        "q2_extract_text": lambda: pages.selectExpr(
            f"{synth.extract_text_expr('html')} AS text"
        ).filter("text IS NOT NULL"),
        "q3_knn": lambda: joins.knn_join(
            base_pts, synth.gazetteer(spark), k=3, res=6
        ),
        "q5_dedup_minhash": lambda: dedup.minhash_lsh_pairs(corpus, 0.8),
        "q6_ann_multiprobe": lambda: simsearch.ivf_multiprobe_topk(
            emb, emb, k=10, n_probe=3, cell_col="ivf_cell"
        ),
        "q7_containment": lambda: dedup.containment_pairs(corpus, 0.5),
    }


def get_session():
    from demeter_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="demeter_spark_bench_extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_plans(tag: str) -> None:
    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("DEMETER_BENCH_FACTOR", "200"))
    res = int(os.environ.get("DEMETER_BENCH_RES", "10"))
    os.makedirs("plans/r07", exist_ok=True)
    for name, fn in build_queries(spark, sf_dir, factor, res).items():
        df = fn()
        path = f"plans/r07/{name}_{tag}.txt"
        with open(path, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ))
        print("wrote", path)
    spark.stop()


def cmd_time(names: list[str], trials: int = 3) -> None:
    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("DEMETER_BENCH_FACTOR", "200"))
    res = int(os.environ.get("DEMETER_BENCH_RES", "10"))
    qs = build_queries(spark, sf_dir, factor, res)
    out = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        ts = []
        for t in range(trials):
            spark.sparkContext.setJobDescription(f"{name} noop trial {t}")
            t0 = time.time()
            noop(fn())
            ts.append(round(time.time() - t0, 3))
        out[name] = {"best": min(ts), "trials": ts}
        print(name, out[name], flush=True)
    print(json.dumps({"noop": out, "load": os.getloadavg()[0]}))
    spark.stop()


def cmd_stages() -> None:
    """Per-stage isolation for the expensive queries (guide §1.1)."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import joins
    from demeter_spark.sources import synth

    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factor = int(os.environ.get("DEMETER_BENCH_FACTOR", "200"))
    res = int(os.environ.get("DEMETER_BENCH_RES", "10"))
    sc = spark.sparkContext
    report = {}

    def t(label, fn, n=3):
        ts = []
        for _ in range(n):
            sc.setJobDescription(label)
            t0 = time.time()
            fn()
            ts.append(round(time.time() - t0, 3))
        report[label] = {"best": min(ts), "trials": ts}
        print(label, report[label], flush=True)

    pts = synth.scaled_page_points(spark, sf_dir, factor)
    par = synth.parcels(spark)
    # q1 decomposition
    t("q1.points_gen", lambda: noop(pts))
    t("q1.cover_build", lambda: noop(joins.parcel_covers(par, res=res)))
    covers = joins.parcel_covers(par, res=res).localCheckpoint(eager=True)
    t("q1.join_refine_only",
      lambda: noop(joins.spatial_join(pts, par, res=res, covers=covers)))
    t("q1.full", lambda: noop(joins.spatial_join(pts, par, res=res)))

    print(json.dumps(report))
    spark.stop()


def cmd_ann_curve() -> None:
    """VERDICT r06 #5: recall@10 vs n_probe on the UNIFORM (isotropic)
    corpus — shows the knob trades compute for recall on structureless
    data too (bench.py is frozen, so the curve lives here + in
    OPTIMIZATION_r07.md)."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import simsearch

    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        max(cpus, 8)
    )
    n_emb = emb.count()
    n_lists = max(8, int(n_emb**0.5))
    emb = emb.withColumn(
        "ivf_cell", F.pmod(F.xxhash64("vec_id"), F.lit(n_lists))
    )
    rq = emb.filter(F.pmod(F.xxhash64("vec_id"), F.lit(40)) == 0)
    exact10 = simsearch.brute_force_topk(emb, rq, k=10).localCheckpoint()
    book = simsearch.train_centroids(emb, n_lists, n_iter=2)
    out = {"n_lists": n_lists, "n_emb": n_emb, "curve": {}}
    for n_probe in (3, 8, 16, 32):
        t0 = time.time()
        rec = simsearch.recall_at_k(
            simsearch.ivf_multiprobe_topk(
                emb, rq, k=10, n_probe=n_probe, cell_col="ivf_cell",
                cents=book,
            ),
            exact10,
        )
        out["curve"][n_probe] = {
            "recall_at_10": round(rec, 4),
            "probe_frac": round(n_probe / n_lists, 4),
            "sec": round(time.time() - t0, 2),
        }
        print(n_probe, out["curve"][n_probe], flush=True)
    print(json.dumps(out))
    spark.stop()


def cmd_curate_scale() -> None:
    """VERDICT r06 #4: curate() docs/sec at two corpus sizes (x1 and xN)
    with per-stage seconds, showing the fixed-per-stage job overhead
    amortizing — the 100 TB posture of the composed pipeline, evidenced."""
    from pyspark.sql import functions as F

    from demeter_spark.operators import curation, dedup, textstats

    spark = get_session()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("DEMETER_CURATE_MULT", "20"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n1 = docs.count()
    # replicate with distinct ids + a leading token marker so replicas are
    # near-dup (not exact-dup) variants, keeping every stage's work honest
    big = docs
    for r in range(1, mult):
        big = big.unionByName(
            docs.selectExpr(
                f"doc_id + {r} * 1000000 AS doc_id",
                f"concat('r{r} ', text) AS text",
            )
        )
    big = big.repartition(64).localCheckpoint(eager=True)
    nN = big.count()
    report = {"n_small": n1, "n_big": nN}
    for tag, frame, n in (("x1", docs, n1), (f"x{mult}", big, nN)):
        stages = {}
        def t(label, fn):
            t0 = time.time()
            fn()
            stages[label] = round(time.time() - t0, 2)
        def noop_(df):
            df.write.format("noop").mode("overwrite").save()
        t("signals_maponly", lambda: noop_(
            textstats.quality_flags(frame)
            .join(textstats.repetition_stats(frame), "doc_id")
            .join(textstats.pii_stats(frame), "doc_id")))
        t("lm_surprise", lambda: noop_(textstats.bigram_surprise(frame, None)))
        t("segment_dedup", lambda: noop_(dedup.segment_dedup(frame)))
        t("neardup_pairs", lambda: dedup.minhash_lsh_pairs(
            frame.select("doc_id", "text"), 0.8).count())
        t0 = time.time()
        kept = curation.curate(frame).filter("keep = 1").count()
        wall = time.time() - t0
        report[tag] = {
            "stages_isolated_sec": stages,
            "curate_wall_sec": round(wall, 2),
            "docs_per_sec": round(n / wall),
            "kept": kept,
        }
        print(tag, report[tag], flush=True)
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "time"
    if cmd == "plans":
        cmd_plans(sys.argv[2] if len(sys.argv) > 2 else "before")
    elif cmd == "stages":
        cmd_stages()
    elif cmd == "ann_curve":
        cmd_ann_curve()
    elif cmd == "curate_scale":
        cmd_curate_scale()
    else:
        cmd_time(sys.argv[2:])
