"""Character-n-gram language identification (Cavnar & Trenkle 1994).

The corpus-curation language gate: train per-language ranked n-gram
profiles from a labeled seed corpus, then classify unlabeled documents by
the out-of-place distance between the document's ranked n-grams and each
profile. This is the classic n-gram text-categorization method (public:
"N-Gram-Based Text Categorization", Cavnar & Trenkle, SDAIR 1994) and the
pre-fastText standard for web-corpus language ID.

Existing coverage note: ``textstats.text_stats`` carries a one-bit
stopword-ratio language guess (the oracle-gated lang_counts row); this
module is the real multi-language classifier, pytest-pinned against a
pure-Python reference (profile construction and out-of-place scoring are
rank arithmetic — deterministic, engine-independent integers).

Scale shape:
- Profile training: explode n-grams over the (small, labeled) seed corpus,
  ONE hash aggregate per (lang, gram), ONE window rank per language,
  top-k filter. Profiles are tokenizer-sized (k grams x L languages).
- Classification: explode n-grams per document, ONE window rank per doc
  (keyed by doc id — no global sort), cross the doc's top grams with the
  broadcast language list, left-join the broadcast profile, ONE aggregate
  per (doc, lang), argmin per doc. The fact table shuffles once on doc id;
  everything joined against it is broadcast. No UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_expr(text_col: str, n: int) -> str:
    """Ranked char n-grams source expression: whitespace-normalized,
    lowercased, space-padded text -> array of n-grams (C&T tokenize with
    word-boundary blanks; a single leading/trailing pad per text plus
    collapsed inner whitespace is the standard simplification)."""
    t = (
        f"concat(' ', lower(regexp_replace(trim({text_col}),"
        f" '[ \\\\t\\\\n\\\\r]+', ' ')), ' ')"
    )
    return (
        f"CASE WHEN length({t}) >= {n} THEN"
        f" transform(sequence(1, length({t}) - {n} + 1),"
        f"  i -> substring({t}, i, {n}))"
        " ELSE array() END"
    )


def train_profiles(
    seed: DataFrame,
    lang_col: str = "lang",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 200,
) -> DataFrame:
    """Labeled seed corpus -> (lang, gram, rank) ranked profiles.

    Rank is 1-based by (count DESC, gram ASC) within each language —
    deterministic because the counts are exact integer sums.
    """
    grams = seed.select(
        F.col(lang_col).alias("lang"),
        F.explode(F.expr(_gram_expr(text_col, n))).alias("gram"),
    )
    counts = grams.groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("gram"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "gram", "rank")
    )


def classify(
    docs: DataFrame,
    profiles: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 200,
) -> DataFrame:
    """Per-document language call: (id, lang, oop_distance, n_doc_grams).

    Out-of-place distance (C&T): for each of the document's top-k ranked
    grams, |doc_rank - profile_rank|, with the "maximum distance" top_k
    for grams absent from the profile; argmin over languages, ties broken
    by language name ASC. Documents with no grams (empty text) get lang
    'und' and distance NULL.
    """
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(F.expr(_gram_expr(text_col, n))).alias("gram"),
    )
    counts = doc_grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c"), F.asc("gram"))
    ranked = (
        counts.withColumn("doc_rank", F.row_number().over(w))
        .filter(F.col("doc_rank") <= top_k)
        .select(id_col, "gram", "doc_rank")
    )
    # language dimension and profiles are tokenizer-sized: broadcast both
    langs = profiles.select("lang").distinct()
    scored = (
        ranked.crossJoin(F.broadcast(langs))
        .join(F.broadcast(profiles), ["lang", "gram"], "left")
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("doc_rank") - F.col("rank")),
                    F.lit(top_k),
                )
            ).alias("oop_distance"),
            F.count(F.lit(1)).alias("n_doc_grams"),
        )
    )
    best = Window.partitionBy(id_col).orderBy(
        F.asc("oop_distance"), F.asc("lang")
    )
    called = (
        scored.withColumn("_rn", F.row_number().over(best))
        .filter(F.col("_rn") == 1)
        .select(id_col, "lang", "oop_distance", "n_doc_grams")
    )
    # empty-text documents never produce grams: re-attach as 'und'
    missing = docs.select(id_col).join(
        called.select(id_col), id_col, "left_anti"
    )
    return called.unionByName(
        missing.select(
            F.col(id_col),
            F.lit("und").alias("lang"),
            F.lit(None).cast("bigint").alias("oop_distance"),
            F.lit(0).cast("bigint").alias("n_doc_grams"),
        )
    )
