"""Benchmark decontamination — eval-set n-gram overlap against the
training corpus (the GPT-3/PaLM-style 13-gram rule: a training document
that shares long n-grams with an evaluation item leaks the benchmark).

Scale shape (the part that matters at 100 TB): the EVAL side is tiny
(thousands of items) — its distinct gram set is BROADCAST, so the
training corpus pays ONE map-only gram pass + a broadcast semi filter;
only the (usually rare) matching grams reach the aggregate. The corpus
is never shuffled on grams and never compared all-pairs. Gram hashes
(xxhash64) stand in for gram text on the wire — 8 bytes instead of
~80, with the collision rate (~n_eval_grams * n_train_grams / 2^64)
immaterial for a flagging pipeline.

Reference anchor: the reference has no eval-hygiene surface (it is a
raster fetch library); this is the webtext-axis analogue of its
overlap-consistency check (merge_conflicts, tilemerge.py — "the same
cell from two sources must agree").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_hashes", "contamination_pairs", "contaminated_ids"]


def ngram_hashes(
    docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, gh) distinct word-n-gram hashes per document. Map-only:
    materialized word array (the repo-wide HOF-lambda rule), gram build,
    distinct-within-doc via array_distinct before the explode so the
    exploded row count is bounded by distinct grams."""
    grams = (
        f"CASE WHEN size(_w) >= {n} THEN"
        f" array_distinct(transform(sequence(1, size(_w) - {n - 1}),"
        f" i -> xxhash64(concat_ws(' ', slice(_w, i, {n})))))"
        " ELSE array() END"
    )
    # whitespace-class split with empty tokens dropped (ADVICE r06: a
    # single-space split left newlines/tabs inside tokens, so an eval
    # passage reformatted with different line breaks hashed differently
    # and the contamination was missed — GPT-3-style normalization splits
    # on any whitespace run, on BOTH train and eval sides since each
    # calls this same function)
    return docs.selectExpr(
        id_col, f"filter(split({text_col}, '\\\\s+'), x -> x != '') AS _w"
    ).selectExpr(id_col, f"explode({grams}) AS gh")


def contamination_pairs(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """(doc_id, eval_id, n_shared, eval_grams, overlap_frac) for every
    training/eval pair sharing at least one n-gram. ``overlap_frac`` is
    the fraction of the EVAL item's grams found in the training doc —
    the decontamination decision statistic."""
    tg = ngram_hashes(train_docs, n, id_col, text_col)
    eg = ngram_hashes(
        eval_docs.select(
            F.col(eval_id_col).alias("_eid"), F.col(text_col)
        ),
        n,
        "_eid",
        text_col,
    )
    esize = eg.groupBy("_eid").agg(F.count(F.lit(1)).alias("eval_grams"))
    hits = tg.join(F.broadcast(eg), "gh").groupBy(id_col, "_eid").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        hits.join(F.broadcast(esize), "_eid")
        .selectExpr(
            id_col,
            f"_eid AS {eval_id_col}",
            "CAST(n_shared AS INT) AS n_shared",
            "CAST(eval_grams AS INT) AS eval_grams",
            "CAST(n_shared AS DOUBLE) / eval_grams AS overlap_frac",
        )
    )


def contaminated_ids(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    **kw,
) -> DataFrame:
    """Distinct training doc ids to DROP: any eval overlap of at least
    ``min_shared`` n-grams (the published recipes drop on a single
    13-gram hit)."""
    id_col = kw.get("id_col", "doc_id")
    return (
        contamination_pairs(train_docs, eval_docs, n, **kw)
        .filter(F.col("n_shared") >= min_shared)
        .select(id_col)
        .distinct()
    )
