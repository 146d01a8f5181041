"""End-to-end web-corpus curation pipeline — the composed training-data
story (the C4/CCNet/Gopher stage order, public recipes throughout):

    language ID -> quality gates -> repetition gates -> PII scrub
    -> LM-surprise filter -> segment dedup -> near-dup dedup
    -> deterministic split assignment

Each stage already exists as an independently-tested operator; ``curate``
composes them into ONE wide per-document decision frame so a user runs a
single call instead of re-plumbing eight joins. The reference engine's
closest analogue is the staged point-enrichment dataflow
(/root/reference/demeter/api.py:13-102 — fetch, join, concat per source);
this is that shape, re-aimed at the webtext axis.

Shuffle accounting (what matters at 100 TB):
- quality / repetition / PII signals are MAP-ONLY selectExprs — fused into
  the same scan, zero Exchanges;
- LM surprise, language ID, segment dedup each shuffle once on their own
  key (gram / doc / segment-hash) and re-key to doc_id for the join;
- near-dup clustering is the existing banded MinHash + contraction loop
  (never all-pairs);
- the final assembly is a doc_id-keyed multi-way join: every post-shuffle
  signal table arrives already hashed on doc_id, so AQE coalesces the
  join into co-partitioned exchanges rather than re-shuffling the corpus
  per signal.

``keep`` is the conjunction actually used to gate training data; the
frame keeps every per-stage flag so downstream consumers can loosen any
single gate without re-running the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demeter_spark.operators import dedup, langid, sampling, textstats
from demeter_spark.plans.fence import eval_fence


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_profiles: DataFrame | None = None,
    keep_langs: tuple[str, ...] = ("en",),
    minhash_threshold: float = 0.8,
    split_key: str | None = None,
    split_weights: dict[str, float] | None = None,
) -> DataFrame:
    """Per-document curation decision frame.

    Columns: id, lang + lang gate, quality signals + keep flag,
    repetition signals + keep flag, PII counts + pii_free, LM-surprise
    signals + keep flag, segment-dedup stats, near-dup cluster id +
    canonical flag, split, and the final ``keep`` conjunction.

    ``lang_profiles``: Cavnar-Trenkle profiles (langid.train_profiles);
    when None, falls back to the stopword-ratio one-bit guess already
    inside quality_flags' n_stop evidence (lang column passes through).
    ``split_key``: column whose salted hash assigns train/valid/test
    (defaults to the id column; use a URL-like column when available so
    re-crawls that renumber documents cannot leak test into train).
    """
    base = docs.select(id_col, text_col, *[
        c for c in docs.columns if c not in (id_col, text_col)
    ])
    # widen a deficient input ONCE for the whole pipeline (r07): the corpus
    # parquet arrives as a handful of partitions in the sandbox, and every
    # map-only signal stage (quality/repetition/PII), the LM explode and
    # the segment kernel would otherwise run on as many cores. Keyed by the
    # doc id, so the downstream doc_id groupBys/joins reuse the layout; the
    # shared key_repartition policy leaves well-partitioned corpora alone.
    from demeter_spark.plans.bucketing import key_repartition

    base = key_repartition(base, id_col)

    # --- map-only signal stages (fused into one scan each, no shuffle).
    # eval_fence: users filter this frame on the keep flags, and predicate
    # pushdown would otherwise re-expand each flag's O(L^2) alias chain
    # into every pushed Filter (measured 21x blowup — see plans/fence.py).
    # The lm/seg/comps branches end in Aggregate/localCheckpoint nodes,
    # which already stop pushdown of derived-column predicates.
    quality = eval_fence(
        textstats.quality_flags(base, id_col, text_col), [id_col]
    )
    repetition = eval_fence(
        textstats.repetition_stats(base, id_col, text_col), [id_col]
    )
    pii = eval_fence(textstats.pii_stats(base, id_col, text_col), [id_col])

    # --- one-shuffle signal stages
    lm = textstats.bigram_surprise(base, None, id_col, text_col).select(
        id_col, "lm_n_trans", "lm_improbable_frac", "keep_lm"
    )
    seg = dedup.segment_dedup(base, id_col, text_col).select(
        id_col, "n_segs", "n_dup_segs", "dedup_fp"
    )

    # --- near-dup clustering: canonical = cluster representative
    pairs = dedup.minhash_lsh_pairs(
        base.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
        minhash_threshold,
    )
    comps = dedup.connected_components(
        pairs,
        base.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")),
    ).select(
        F.col("doc_id").alias(id_col),
        F.col("cluster_id").alias("neardup_cluster"),
    )

    out = (
        base.drop(text_col)
        .join(quality.withColumnRenamed("keep", "keep_quality"), id_col)
        .join(
            repetition.select(
                id_col, "top_gram_frac", "dup_gram_frac", "keep_repetition"
            ),
            id_col,
        )
        .join(pii.select(id_col, "n_email", "n_ipv4", "n_phone", "pii_free"), id_col)
        # LEFT join + defined defaults (ADVICE r06, medium): bigram_surprise
        # emits no row for docs with zero transitions (< 2 words; fully-OOV
        # under an external LM), and an inner join made such docs vanish
        # from the decision frame entirely instead of getting a verdict.
        # An un-scorable doc passes the LM gate (no evidence against it)
        # with lm_n_trans = 0; same guard for segment_dedup's empty-doc
        # case so every input doc surfaces exactly one decision row.
        .join(lm, id_col, "left")
        .withColumn("lm_n_trans", F.coalesce("lm_n_trans", F.lit(0)))
        .withColumn(
            "lm_improbable_frac",
            F.coalesce("lm_improbable_frac", F.lit(0.0)),
        )
        .withColumn("keep_lm", F.coalesce("keep_lm", F.lit(1)))
        .join(seg, id_col, "left")
        .withColumn("n_segs", F.coalesce("n_segs", F.lit(0)))
        .withColumn("n_dup_segs", F.coalesce("n_dup_segs", F.lit(0)))
        .join(comps, id_col)
        .withColumn(
            "keep_neardup",
            (F.col(id_col) == F.col("neardup_cluster")).cast("int"),
        )
    )

    if lang_profiles is not None:
        called = langid.classify(
            docs.select(id_col, text_col), lang_profiles, id_col, text_col
        ).select(id_col, F.col("lang").alias("lang_id"), "oop_distance")
        out = out.join(called, id_col).withColumn(
            "keep_lang",
            F.col("lang_id").isin(*keep_langs).cast("int"),
        )
    else:
        out = out.withColumn("lang_id", F.lit(None).cast("string")).withColumn(
            "keep_lang", F.lit(1)
        )

    out = out.withColumn(
        "keep",
        (
            (F.col("keep_quality") == 1)
            & (F.col("keep_repetition") == 1)
            & (F.col("keep_lm") == 1)
            & (F.col("keep_lang") == 1)
            & (F.col("keep_neardup") == 1)
        ).cast("int"),
    )
    key = split_key or id_col
    return sampling.split_assign(
        out.withColumn("_split_key", F.col(key).cast("string")),
        weights=split_weights,
        key_col="_split_key",
    ).drop("_split_key")
