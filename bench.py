"""Benchmark harness: flagship queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line for the driver.

Throughput metric (BASELINE.json): spatial-join + tiling rows/sec. The
driver-provided tables are small, so the point fact table is deterministically
replicated (DEMETER_BENCH_FACTOR, default 200 -> ~1M points at sf0.1) before
the join; counts are of *joined output rows + scanned points*.

Scaling-efficiency protocol (two-cluster-size rule): run this same script
with SPARK_GRAFT_CPUS=8 and =32 on the same input; see bench/scaling.py which
automates it and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    factor = int(os.environ.get("DEMETER_BENCH_FACTOR", "200"))

    from demeter_spark.operators import joins
    from demeter_spark.session import get_spark
    from demeter_spark.sources import synth

    spark = get_spark(
        app_name="demeter_spark_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    # q1: flagship spatial join (geocode -> cover join -> PIP refine)
    pts = synth.scaled_page_points(spark, sf_dir, factor)
    par = synth.parcels(spark)
    t0 = time.time()
    n_pts = pts.count()
    joined = joins.spatial_join(pts, par, res=8)
    rows["q1_spatial_join"] = joined.count()
    timings["q1_spatial_join"] = time.time() - t0

    # q2: byte-identical text extraction over all pages
    t0 = time.time()
    pages = synth.pages(spark, sf_dir)
    rows["q2_extract_text"] = pages.selectExpr(
        f"{synth.extract_text_expr('html')} AS text"
    ).filter("text IS NOT NULL").count()
    timings["q2_extract_text"] = time.time() - t0

    # q3: kNN via k-ring (all base pages, k=3)
    t0 = time.time()
    base_pts = synth.page_points(spark, sf_dir)
    knn = joins.knn_join(base_pts, synth.gazetteer(spark), k=3, res=6)
    rows["q3_knn"] = knn.count()
    timings["q3_knn"] = time.time() - t0

    total = sum(timings.values())
    throughput = (n_pts + rows["q1_spatial_join"]) / timings["q1_spatial_join"]
    print(
        json.dumps(
            {
                "metric": "spatial_join_tiling_total_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": sf_dir,
                "rows": rows,
                "n_points": n_pts,
                "spatial_join_rows_per_sec": round(throughput),
                "cpus": cpus,
                "bench_factor": factor,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
