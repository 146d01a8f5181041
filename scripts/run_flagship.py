"""spark-submit entrypoint: the flagship geocode -> cover join -> PIP refine
pipeline over a pages directory, writing joined output + lineage metrics.

Run via scripts/submit.sh (ships demeter_spark as --py-files). The two-
cluster-size protocol is: submit with N executors, record
`spatial_join_rows_per_sec` from the emitted JSON line, resubmit with 4N,
compare (target efficiency >= 0.8)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# local runs; under spark-submit --py-files the zip is already on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--output", default=None)
    ap.add_argument("--res", type=int, default=10)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from demeter_spark.operators import joins
    from demeter_spark.plans.lineage import LineageLog
    from demeter_spark.sources import synth

    spark = SparkSession.builder.appName("demeter-spark-flagship").getOrCreate()
    pts = synth.page_points(spark, args.sf_dir)
    par = synth.parcels(spark)
    t0 = time.time()
    joined = joins.spatial_join(pts, par, res=args.res)
    # throughput = THIS run's computed rows (a resumed submission that
    # skips committed partitions must not inherit history's row count)
    n = joined.count()
    dt = time.time() - t0
    n_parts = 0
    if args.output:
        from pyspark.sql import functions as F

        log = LineageLog(spark, args.output)
        n_parts = log.write_increment(
            "flagship_join",
            joined.withColumn("_bucket", F.pmod(F.xxhash64("url"), F.lit(64))),
            "_bucket",
            fingerprint=args.sf_dir,
        )
    print(
        json.dumps(
            {
                "rows": n,
                "sec": round(dt, 3),
                "rows_per_sec": round(n / dt),
                "partitions_committed": n_parts,
            }
        )
    )


if __name__ == "__main__":
    main()
