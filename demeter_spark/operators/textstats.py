"""Text analysis over the documents/pages corpus: token stats, quality
scores, language-ID heuristic, content fingerprints.

Training-data-pipeline operators beyond the reference's scope (the reference
is raster/vector; these cover the webtext payload of the north rule). All
JVM-side expressions — split / higher-order array functions / md5 — chosen to
be expressible identically in DuckDB for exact oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def text_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token counts, type-token ratio, stopword ratio, mean word
    length, language guess, and a composite quality score."""
    stop_pred = " OR ".join(f"w = '{s}'" for s in STOPWORDS)
    return docs.selectExpr(
        id_col,
        f"split({text_col}, ' ') AS _w",
        f"length({text_col}) AS n_chars_text",
    ).selectExpr(
        id_col,
        "n_chars_text",
        "size(_w) AS n_tokens",
        "size(array_distinct(_w)) AS n_types",
        "CAST(size(array_distinct(_w)) AS DOUBLE) / size(_w) AS ttr",
        f"CAST(size(filter(_w, w -> {stop_pred})) AS DOUBLE) / size(_w) AS stop_ratio",
        "CAST(length(replace(concat_ws(' ', _w), ' ', '')) AS DOUBLE) / size(_w)"
        " AS mean_word_len",
    ).selectExpr(
        id_col,
        "n_chars_text",
        "n_tokens",
        "n_types",
        "ttr",
        "stop_ratio",
        "mean_word_len",
        "CASE WHEN stop_ratio >= 0.02 THEN 'en' ELSE 'xx' END AS lang_guess",
        "CASE WHEN n_tokens >= 20 AND ttr >= 0.3 THEN 1 ELSE 0 END AS quality_ok",
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-text md5 + normalized (lowercase, collapsed
    whitespace) md5 — the exact-dedup keys."""
    return docs.selectExpr(
        id_col,
        f"md5({text_col}) AS fp_raw",
        f"md5(lower(regexp_replace({text_col}, ' +', ' '))) AS fp_norm",
    )
