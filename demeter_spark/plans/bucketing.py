"""Bucketed, co-located joins: pre-partition both sides by cell id so the
cover join runs with NO exchange at query time.

The 100 TB posture (task mandate: "bucketing for co-located joins"): when the
polygon cover is too large to broadcast (continental parcel sets at fine
resolution), both the points fact table and the cover table are written
bucketed by their join key. Spark's bucketed scan then feeds a SortMergeJoin
whose children require no ShuffleExchange — the shuffle is paid once at write
time and amortized across every subsequent join.

Bucket count is the knob that must survive 100x scale-up: buckets ~ total
size / target task input (e.g. 100 TB / 256 MB -> ~400k buckets across the
cluster); here sandbox-sized defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Persist a table bucketed (and sorted) by the join key."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        w = w.sortBy(bucket_col)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str,
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``key`` — exchange-free by construction
    (assert via tests/test_bucketing.py on the physical plan)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key, how)


def key_repartition(
    df: DataFrame,
    key: str,
    n_input: int | None = None,
) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` ONLY when the input parallelism
    is deficient (fewer partitions than the shuffle width) — the shared
    policy behind ``dedup.shingles`` and
    ``textstats.winnowing_fingerprints`` (ADVICE r05: one mechanism, one
    probe, one policy). A corpus read as a handful of partitions would
    otherwise run its per-doc kernels/explodes on as many cores; a
    well-partitioned corpus is left alone because re-shuffling the raw
    text costs more than whatever the downstream stages shuffle
    (map-side-combined aggregate rows, or nothing at all for the narrow
    winnowing kernel).

    ``n_input``: explicit input-partition-count hint. When None it is
    probed via ``df.rdd.getNumPartitions()``, which forces physical
    planning of the input plan once at plan-construction time — cheap for
    a scan, noticeable for a deep composed plan, and it reports the
    PRE-shuffle layout (ADVICE r05) — so composed pipelines that know
    their parallelism should pass the hint."""
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if n_input is None:
        n_input = df.rdd.getNumPartitions()
    if n_input < width:
        return df.repartition(width, key)
    return df


def cluster_sort(
    df: DataFrame,
    range_keys: tuple[str, ...],
    sort_keys: tuple[str, ...] = (),
) -> DataFrame:
    """O2 cluster-sort pipelining: range-partition on ``range_keys`` then
    sort rows within each partition by (range_keys + sort_keys).

    The reference's engine emits clustered+sorted result sets (ORDER BY on
    the remote engine); on Spark the equivalent is one range Exchange + a
    partition-local sort — globally ordered output across partition
    boundaries without a single-node global sort, and downstream
    per-partition consumers (sorted-run writers, merge readers,
    mapPartitions kernels that binary-search) see sorted input. Writing
    parquet from this shape also clusters row groups by key, so future
    range predicates prune at the scan.
    """
    all_keys = [F.col(k) for k in (*range_keys, *sort_keys)]
    return df.repartitionByRange(*[F.col(k) for k in range_keys]).sortWithinPartitions(
        *all_keys
    )
