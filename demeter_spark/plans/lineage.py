"""Per-partition lineage + row-count metrics with resumable commits.

North-rule requirement (BASELINE.json:14): "every stage writes per-partition
lineage + row-count metrics to a metrics table so any run resumes from the
last committed snapshot/checkpoint". The reference achieves resumability with
idempotent multi-level file caches + FileLock (demeter/raster/polaris.py:
373-431, demeter/raster/usgs/utils.py:18-30, sentinel2/utils/download.py:
61-76); here the same property is a table-format protocol:

- stage outputs land in a parquet table partitioned by an explicit partition
  key column (``_part``);
- a ``_snapshots`` manifest records (stage, part, input fingerprint, row
  count, snapshot id) per committed partition;
- a re-run anti-joins its input partitions against the manifest and only
  computes/writes the missing ones. Partition writes use dynamic partition
  overwrite, so a crash between data write and manifest append is healed by
  the retry overwriting the same partition (idempotent task semantics).

The API is deliberately narrow (write_increment / committed_parts / metrics)
so a real Iceberg/Delta catalog can replace the parquet manifest on a
cluster without touching call sites.

Concurrency contract: SINGLE WRITER per LineageLog base_dir. ``seq`` is
minted read-modify-write (max(seq)+1 over the manifest), so concurrent
write_increment calls — even to different stages — could mint duplicate seq
values and corrupt snapshot ordering. A real catalog replaces this with its
own atomic commit protocol (Iceberg optimistic-concurrency swaps); the
parquet stand-in documents the restriction instead of faking one.

Manifest growth: each commit appends one small file; every
``compact_every`` commits the manifest is rewritten to a single file
(contents preserved row-for-row, so seq ordering and snapshot ids are
unchanged), keeping per-commit manifest-scan cost O(compact_every) instead
of O(total commits). The rewrite uses a write-tmp / swap / drop-old
sequence; a crash mid-swap loses only the manifest (data partitions are
untouched), which the resume protocol heals by recomputing idempotently.
Compaction is LOCAL-FILESYSTEM ONLY (the swap is os.rename): on an
HDFS/S3/file-scheme base_dir it is skipped automatically (manifest scans
degrade to O(total commits) but stay correct); a real catalog's own
compaction replaces it there. During the swap there is a window where
``snapshots()`` sees no manifest — the single-writer contract therefore
also excludes CONCURRENT READERS during compaction, not just writers
(ADVICE r03).

Schema evolution: increments may ADD columns over time. Reads merge parquet
footers (``mergeSchema``), so ``read_stage`` always returns the UNION
schema; partitions written before a column existed surface NULL for it —
the standard add-column evolution contract (pytest-verified in
tests/test_resume_skew.py). Renames/drops/type-changes need a real
catalog's column-id mapping and are out of scope for the parquet stand-in.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SNAPSHOT_SCHEMA = (
    "stage STRING, part BIGINT, fingerprint STRING, n_rows BIGINT, "
    "snapshot_id STRING, seq BIGINT"
)


class LineageLog:
    def __init__(self, spark: SparkSession, base_dir: str, compact_every: int = 16):
        self.spark = spark
        self.base_dir = base_dir
        self.manifest_path = os.path.join(base_dir, "_snapshots")
        self.compact_every = max(int(compact_every), 2)

    def snapshots(self) -> DataFrame:
        try:
            return self.spark.read.parquet(self.manifest_path)
        except Exception:
            return self.spark.createDataFrame([], SNAPSHOT_SCHEMA)

    def _read_merged(self, path: str) -> DataFrame:
        """Stage read with add-column schema evolution: merge parquet
        footers so increments written before a column existed read as NULL
        (module docstring, Schema evolution)."""
        return self.spark.read.option("mergeSchema", "true").parquet(path)

    def committed_parts(self, stage: str, fingerprint: str) -> DataFrame:
        return (
            self.snapshots()
            .filter(
                (F.col("stage") == stage) & (F.col("fingerprint") == fingerprint)
            )
            .select("part")
            .distinct()
        )

    def metrics(self) -> DataFrame:
        """Row-count metrics per (stage, part): the A12/P6-style assertion
        surface — consumers join this to detect empty/skewed partitions."""
        return self.snapshots().groupBy("stage", "part").agg(
            F.sum("n_rows").alias("n_rows"),
            F.count("*").alias("n_commits"),
        )

    def write_increment(
        self,
        stage: str,
        df: DataFrame,
        part_col: str,
        fingerprint: str,
    ) -> int:
        """Write only not-yet-committed partitions of ``df``; returns the
        number of partitions written. ``df`` must carry ``part_col``
        (a deterministic bucket, e.g. pmod(xxhash64(url), N)).

        A fingerprint identifies one input snapshot; resuming the same
        fingerprint is incremental and crash-healing. A NEW fingerprint over
        a SHRUNKEN input (partitions vanished) should use a fresh stage path
        — stale on-disk partitions from the old fingerprint are not deleted
        by dynamic overwrite (the usual snapshot-table rule)."""
        from pyspark.sql import Observation

        done = self.committed_parts(stage, fingerprint)
        todo = df.withColumn("_part", F.col(part_col).cast("long")).join(
            F.broadcast(done), F.col("_part") == done["part"], "left_anti"
        )
        # the set of partitions THIS run writes is observed on the write
        # action itself (zero extra pass) — committing exactly these, never
        # whatever else sits in the directory, so partitions committed under
        # a different fingerprint can never be re-committed with stale bytes
        obs = Observation()
        todo = todo.observe(obs, F.collect_set("_part").alias("parts"))
        out_path = os.path.join(self.base_dir, stage)
        # SINGLE pass over the data: write first, then derive the manifest's
        # per-partition counts from the written files — selecting only the
        # partition column makes the count job metadata-cheap (parquet
        # footers, zero data columns). A crashed write under the SAME
        # fingerprint heals on retry: its partitions are still uncommitted,
        # so they land in todo again, are rewritten idempotently (dynamic
        # overwrite) and committed then.
        (
            todo.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_part")
            .parquet(out_path)
        )
        written_parts = [int(p) for p in (obs.get["parts"] or [])]
        if not written_parts:
            return 0
        written = self.spark.read.parquet(out_path)
        counts = (
            written.select("_part")
            .filter(F.col("_part").isin(written_parts))
            .groupBy("_part")
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
        if not counts:
            return 0
        snap_id = str(uuid.uuid4())
        prev = self.snapshots().agg(F.max("seq")).first()[0]
        seq = (prev or 0) + 1
        rows = [
            (stage, int(r["_part"]), fingerprint, int(r["n_rows"]), snap_id, seq)
            for r in counts
        ]
        self.spark.createDataFrame(rows, SNAPSHOT_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.manifest_path)
        if seq % self.compact_every == 0:
            self._compact_manifest()
        return len(rows)

    def _compact_manifest(self) -> None:
        """Rewrite the manifest to one file (rows preserved exactly) so the
        per-commit max(seq)/committed_parts scans stay O(compact_every)
        files regardless of commit count. Single-writer protocol (see module
        docstring) — during the swap, concurrent READERS may observe a
        missing manifest, so the contract excludes them too. The swap is
        os.rename: local POSIX paths only; skipped (correct, just slower
        scans) for remote URIs — with a warning, so a caller relying on
        bounded manifest scans gets a signal (ADVICE r04: expire_snapshots
        RAISES for the same limitation because it is an explicit user
        action whose effect would silently not happen; compaction is an
        automatic background optimization, so skip-and-warn is the right
        contract — the difference is now documented in both places)."""
        if "://" in self.manifest_path or not os.path.isdir(self.manifest_path):
            import warnings

            warnings.warn(
                f"manifest compaction skipped for {self.manifest_path!r} "
                "(non-local or missing path): committed_parts/metrics scans "
                "degrade to O(total commits) files",
                RuntimeWarning,
                stacklevel=2,
            )
            return
        tmp = self.manifest_path + ".compact-tmp"
        old = self.manifest_path + ".compact-old"
        for stale in (tmp, old):
            if os.path.exists(stale):
                shutil.rmtree(stale)
        # materializes fully into tmp before any swap touches the live path
        self.spark.read.parquet(self.manifest_path).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.rename(self.manifest_path, old)
        os.rename(tmp, self.manifest_path)
        shutil.rmtree(old)

    def read_stage(self, stage: str, as_of: str | None = None) -> DataFrame:
        """Read a stage's table; with ``as_of`` = a snapshot id, read ONLY
        the partitions committed up to and including that snapshot — the
        Iceberg-snapshot-read analogue over the parquet manifest. The filter
        is on the partition column, so Spark prunes whole partition
        directories (no data files from later commits are opened).

        Validity contract: snapshot reads are exact under the append-only
        protocol (one fingerprint per stage path; each partition committed
        once). A run under a DIFFERENT fingerprint that overwrites an
        already-committed partition invalidates older snapshots of that
        partition (as snapshot expiry does in a real table format) — use a
        fresh stage path per fingerprint, as write_increment documents."""
        df = self._read_merged(os.path.join(self.base_dir, stage))
        if as_of is None:
            return df
        snaps = self.snapshots().filter(F.col("stage") == stage)
        # commit order = the monotonic seq stamped at append time
        ordered = [
            r["snapshot_id"]
            for r in snaps.select("snapshot_id", "seq")
            .distinct()
            .orderBy("seq")
            .collect()
        ]
        if as_of not in ordered:
            raise ValueError(f"unknown snapshot {as_of!r} for stage {stage!r}")
        keep = set(ordered[: ordered.index(as_of) + 1])
        parts = [
            int(r["part"])
            for r in snaps.filter(F.col("snapshot_id").isin(keep))
            .select("part")
            .distinct()
            .collect()
        ]
        return df.filter(F.col("_part").isin(parts))

    def snapshot_ids(self, stage: str) -> list[str]:
        """Committed snapshot ids for a stage, in commit order."""
        return [
            r["snapshot_id"]
            for r in self.snapshots()
            .filter(F.col("stage") == stage)
            .select("snapshot_id", "seq")
            .distinct()
            .orderBy("seq")
            .collect()
        ]

    def expire_snapshots(self, stage: str, keep_last: int) -> int:
        """Iceberg-style snapshot expiry: narrow a stage's time-travel
        window to its ``keep_last`` newest snapshots; returns how many
        snapshot ids were expired.

        The append-only protocol commits each partition exactly once, so
        data files stay live forever — expiry must NOT forget that a
        partition is committed (resume would recompute it). Expired
        snapshots' manifest rows are therefore FOLDED into the oldest
        retained snapshot (their rows adopt its snapshot_id and seq) rather
        than deleted: committed_parts/metrics are unchanged, reads of
        retained snapshot ids return exactly what they did before, and only
        ``read_stage(as_of=<expired id>)`` stops resolving — the same
        contract as expireSnapshots in a real table format. Single-writer
        protocol applies (manifest rewrite, same as compaction), and like
        compaction the swap is os.rename: local filesystems only. Unlike
        automatic compaction (which skips with a warning — an optimization
        that degrades gracefully), this explicit maintenance action RAISES
        on non-local paths: silently not expiring would break the caller's
        retention expectations (ADVICE r04 contract alignment)."""
        if "://" in self.manifest_path or not os.path.isdir(self.manifest_path):
            raise ValueError(
                "expire_snapshots needs a local-filesystem manifest"
                " (a real catalog's expireSnapshots replaces it elsewhere)"
            )
        snaps = self.snapshots()
        mine = snaps.filter(F.col("stage") == stage)
        ordered = [
            (r["snapshot_id"], r["seq"])
            for r in mine.select("snapshot_id", "seq")
            .distinct()
            .orderBy("seq")
            .collect()
        ]
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        if len(ordered) <= keep_last:
            return 0
        retained = ordered[-keep_last:]
        expired_ids = [sid for sid, _ in ordered[:-keep_last]]
        base_id, base_seq = retained[0]
        folded = mine.withColumns(
            {
                "snapshot_id": F.when(
                    F.col("snapshot_id").isin(expired_ids), F.lit(base_id)
                ).otherwise(F.col("snapshot_id")),
                "seq": F.when(
                    F.col("snapshot_id").isin(expired_ids), F.lit(int(base_seq))
                ).otherwise(F.col("seq")),
            }
        )
        rewritten = snaps.filter(F.col("stage") != stage).unionByName(folded)
        tmp = self.manifest_path + ".expire-tmp"
        rewritten.coalesce(1).write.mode("overwrite").parquet(tmp)
        old = self.manifest_path + ".expire-old"
        if os.path.exists(old):
            shutil.rmtree(old)
        os.rename(self.manifest_path, old)
        os.rename(tmp, self.manifest_path)
        shutil.rmtree(old)
        return len(expired_ids)


def observe_stage(df: DataFrame, name: str):
    """Attach a zero-cost row-count/metric observation to a stage.

    Returns (df, Observation); after any action on df, ``obs.get`` yields
    {'n_rows': ...} — per-stage metrics without a second pass (the
    Observation API rides the existing action). Feed the result into
    LineageLog or assertions (the reference's validated-merge / disjointness
    checks, SURVEY.md J5/P6, become observations here).
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs
