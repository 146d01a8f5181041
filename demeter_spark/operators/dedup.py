"""Large-scale training-data deduplication over the documents/pages tables.

Beyond the reference's operator set (it has only drop_duplicates-style dedup,
demeter/utils.py:46-57 / SURVEY.md §2.2 P14), these are the web-scale dedup
operators a 10^12-page corpus pipeline needs. All hot paths are JVM-side
expressions (split/explode/hash/groupBy) — Python appears only in the SimHash
bit-fold kernel, as a vectorized Arrow pandas UDF.

Scale posture:
- shingling explodes ~L rows per doc: partial aggregation + distinct before
  the self-join keeps shuffle proportional to distinct (shingle, doc) pairs;
- the pair join is bounded by a shingle document-frequency cap (``max_df``,
  standard near-dup practice: ultra-common shingles generate O(n^2) candidate
  pairs and carry no signal);
- MinHash/LSH replaces the quadratic self-join with band-bucket equi-joins;
  candidates are verified with exact Jaccard so output = exact pairs modulo
  LSH recall (tested >= 1 - 3e-8 per pair for the fixture similarity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

# NB: Spark's sequence(1, 0) *descends* ([1, 0]) rather than returning an
# empty array, so short documents must be guarded explicitly.
SHINGLE_EXPR = """
    CASE WHEN size(_words) < 3 THEN array()
         ELSE array_distinct(transform(
           sequence(1, size(_words) - 2),
           i -> concat_ws(' ', element_at(_words, i), element_at(_words, i + 1),
                          element_at(_words, i + 2))
         ))
    END
"""


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """word 3-gram shingle set per document: (id, shingle) distinct rows."""
    return (
        docs.select(id_col, F.split(F.col(text_col), " ").alias("_words"))
        .select(id_col, F.explode(F.expr(SHINGLE_EXPR)).alias("shingle"))
    )


def exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup by content hash: cluster id = min doc id per md5(text)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard >= t).

    Self-join on shingle -> |A∩B| counts, then J = inter / (|A| + |B| - inter).
    ``max_df`` drops shingles occurring in more than max_df docs before the
    join: a shingle shared by d docs yields O(d^2) candidate pairs, so the
    cap is what keeps the self-join bounded at corpus scale. Default None =
    exact (never silently lossy); corpus-scale callers MUST set it — the
    wired driver query passes max_df=32 with the identical cap mirrored in
    its oracle.
    """
    sh = shingles(docs, id_col, text_col)
    if max_df is not None:
        df_counts = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
        sh = sh.join(df_counts.filter(F.col("_df") <= max_df), "shingle").drop("_df")
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """MinHash + LSH near-dup pairs, verified with exact Jaccard.

    signature[j] = min over shingles of xxhash64(shingle, j); band signature =
    hash of its rows; candidate pairs share >= 1 band bucket; candidates are
    then *verified* (exact Jaccard via one more shingle join restricted to
    candidates) so precision is exact and recall is the LSH band guarantee.
    """
    rows_per_band = num_hashes // bands
    sh = shingles(docs, id_col, text_col)
    seeds = F.array(*[F.lit(j) for j in range(num_hashes)])
    sig = (
        sh.select(id_col, F.explode(seeds).alias("j"), F.col("shingle"))
        .withColumn("h", F.xxhash64("j", "shingle"))
        .groupBy(id_col, "j")
        .agg(F.min("h").alias("minhash"))
        .withColumn("band", (F.col("j") / rows_per_band).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.xxhash64(F.sort_array(F.collect_list(F.struct("j", "minhash")))).alias("bucket"))
    )
    cand = (
        sig.alias("x")
        .join(sig.alias("y"), ["band", "bucket"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
        )
        .distinct()
    )
    # exact-Jaccard verification restricted to candidates
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnsRenamed({"doc_id": "doc_a", "n_sh": "n_a"}), "doc_a")
        .join(sizes.withColumnsRenamed({"doc_id": "doc_b", "n_sh": "n_b"}), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


@F.pandas_udf(LongType())
def _simhash64(hashes: pd.Series) -> pd.Series:
    """Fold per-doc token-hash arrays into a 64-bit SimHash (vectorized)."""
    out = np.empty(len(hashes), dtype=np.int64)
    for i, arr in enumerate(hashes):  # per-doc loop; inner ops vectorized
        h = np.asarray(arr, dtype=np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
            np.int64
        )
        votes = (2 * bits - 1).sum(axis=0)
        sim = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sim |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sim)
    return pd.Series(out)


# token-hash SQL fragments (64-bit): xxhash64 is the cheap scale default;
# the md5 variant is engine-portable (DuckDB computes identical hex), which
# makes the whole SimHash pipeline oracle-checkable end-to-end
TOKEN_HASH_XX = "xxhash64(t)"
TOKEN_HASH_MD5 = (
    "(shiftleft(CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT), 32)"
    " | CAST(conv(substring(md5(t), 9, 8), 16, 10) AS BIGINT))"
)


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = TOKEN_HASH_XX,
) -> DataFrame:
    """64-bit SimHash per document from 64-bit token hashes (vote fold)."""
    toks = docs.select(
        id_col,
        F.expr(f"transform(split({text_col}, ' '), t -> {token_hash})").alias("_h"),
    )
    return toks.select(id_col, _simhash64(F.col("_h")).alias("simhash"))


def simhash_near_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash: str = TOKEN_HASH_XX,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Blocked by 16-bit bands (4 bands: any pair within Hamming 3 shares at
    least one exact band — pigeonhole), then exact popcount verify.
    """
    sig = simhash(docs, id_col, text_col, token_hash)
    banded = sig.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select(id_col, "simhash", "bk.band", "bk.key")
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "key"])
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(
            F.col(f"x.{id_col}").alias("doc_a"),
            F.col(f"y.{id_col}").alias("doc_b"),
            F.col("x.simhash").alias("sim_a"),
            F.col("y.simhash").alias("sim_b"),
        )
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("doc_a", "doc_b", "hamming")


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster near-dup pairs into components: (id, cluster_id = min doc id
    reachable). Dedup needs GROUPS, not pairs — keep one doc per cluster.

    Iterative min-label propagation (driver-controlled loop, the standard
    Spark shape for unknown-diameter graphs): each round pushes labels across
    edges and folds with min; converged when no label shrinks. Near-dup
    graphs are star-like (diameter ~2-3), so rounds stay in the low single
    digits; per-round state (id, label) is persisted and the previous round's
    cache is released. At extreme skew (one giant component) the alternating
    large-star/small-star contraction is the drop-in upgrade; the plain
    propagation keeps the oracle-matched semantics.
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).persist()
    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("label")
    ).persist()
    for _ in range(max_iter):
        prop = edges.join(labels, edges["src"] == labels["id"]).select(
            F.col("dst").alias("id"), "label"
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        n_changed = (
            new_labels.join(
                labels.withColumnRenamed("label", "_old"), "id"
            )
            .filter(F.col("label") < F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if n_changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds max_iter); raise max_iter"
        )
    edges.unpersist()
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )
