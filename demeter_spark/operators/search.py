"""Inverted-index construction + conjunctive search over the crawled
corpus — the serve-side product a crawl pipeline feeds (the reference's
serve-side analogues are the tile pyramid / vector-tile cut: R15/R16
precompute what queries read).

Scale shape:
- the index is ONE explode + ONE map-side-combined groupBy(token):
  posting lists are sorted arrays of doc ids (order-independent build —
  sort_array makes the layout deterministic under any shuffle);
  ``max_df`` caps stop-token postings the same way the dedup stack caps
  shingle frequency (a 10^12-doc posting for 'the' is not a useful
  posting — it is a table scan in disguise);
- search is a broadcast of the (tiny) query-term set, a semi filter of
  the index, and ONE groupBy(doc) HAVING count = n_terms — conjunctive
  (AND) semantics without intersecting arrays driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["build_inverted_index", "search_all_terms"]


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(token, df, postings array<id>) — lowercased whitespace tokens,
    distinct within doc before the explode (posting lists are doc sets).
    Tokens appearing in more than ``max_df`` documents are dropped
    (stop-token cap; NULL keeps everything)."""
    toks = docs.selectExpr(
        id_col,
        f"explode(array_distinct(split(lower({text_col}), ' '))) AS token",
    ).where("token != ''")
    idx = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("int").alias("df"),
        F.sort_array(F.collect_list(id_col)).alias("postings"),
    )
    if max_df is not None:
        idx = idx.where(F.col("df") <= max_df)
    return idx


def search_all_terms(
    index: DataFrame, terms: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing ALL ``terms`` (conjunctive search): explode
    the matching posting lists and keep docs hit by every term — one
    broadcast-filtered explode + one count aggregate, no driver-side
    list intersection. Terms are lowercased to match the index."""
    want = sorted({t.lower() for t in terms})
    hits = (
        index.where(F.col("token").isin(want))
        .select(F.explode("postings").alias(id_col))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("int").alias("n_terms_hit"))
        .where(F.col("n_terms_hit") == len(want))
        .select(id_col)
    )
    return hits
