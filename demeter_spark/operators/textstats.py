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


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Token counting, whitespace + BPE-ish regex subwords (task mandate):
    letter runs / digit runs / single punctuation marks — the pre-tokenizer
    shape of byte-pair encoders. Pure JVM regex, no UDF."""
    return docs.selectExpr(
        id_col,
        f"CAST(size(split({text_col}, ' ')) AS INT) AS n_ws_tokens",
        f"CAST(size(regexp_extract_all(lower({text_col}),"
        " '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)) AS INT) AS n_subtokens",
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprints: full-text md5 + normalized (lowercase, collapsed
    whitespace) md5 — the exact-dedup keys."""
    return docs.selectExpr(
        id_col,
        f"md5({text_col}) AS fp_raw",
        f"md5(lower(regexp_replace({text_col}, ' +', ' '))) AS fp_norm",
    )


def quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_top_word_frac: float = 0.2,
    min_ttr: float = 0.3,
) -> DataFrame:
    """Gopher-style quality-filter signals (repetition + lexical-diversity
    heuristics of the published web-corpus filtering recipes), pure JVM
    higher-order expressions — no UDF:

    - n_words bounds (too-short documents),
    - top_word_frac: occurrences of the most frequent token / n_words (the
      'fraction of the most common word' repetition filter),
    - ttr: type-token ratio,
    - n_stop: distinct stopwords present (language-evidence filter),
    - keep: the conjunction actually used to gate training data.

    O(L^2) per doc for the repetition scan (L = tokens, bounded by the
    tokenizer upstream) inside codegen — cheaper than a groupBy explode at
    corpus scale because nothing leaves the row.
    """
    ws = "split(%s, ' ')" % text_col
    top = (
        f"array_max(transform(array_distinct({ws}),"
        f" w -> size(filter({ws}, x -> x = w))))"
    )
    return docs.selectExpr(
        id_col,
        f"CAST(size({ws}) AS INT) AS n_words",
        f"CAST({top} AS INT) AS top_word_n",
        f"CAST({top} AS DOUBLE) / size({ws}) AS top_word_frac",
        f"CAST(size(array_distinct({ws})) AS DOUBLE) / size({ws}) AS ttr",
        "CAST(size(array_intersect(split(%s, ' '), array('the','a','of','and','to','in','is'))) AS INT) AS n_stop"
        % text_col,
    ).selectExpr(
        id_col,
        "n_words",
        "top_word_n",
        "top_word_frac",
        "ttr",
        "n_stop",
        f"CAST(CASE WHEN n_words >= {min_words}"
        f" AND top_word_frac <= {max_top_word_frac}e0"
        f" AND ttr >= {min_ttr}e0 AND n_stop >= 1"
        " THEN 1 ELSE 0 END AS INT) AS keep",
    )


def canonical_url_expr(col: str) -> str:
    """Spark SQL text canonicalizing a crawl URL — the dedup key every web
    pipeline needs before exact URL dedup:

    lowercase scheme+host, strip default ports (:80 http / :443 https) and
    a leading 'www.', drop the fragment, remove tracking parameters
    (utm_*, fbclid, gclid, ref), sort surviving query params, trim a
    trailing slash on non-root paths. Pure Catalyst string/array exprs.
    """
    u = f"regexp_replace({col}, '#.*$', '')"  # fragment off first
    proto = f"lower(regexp_extract({u}, '^([A-Za-z]+)://', 1))"
    hostport = f"lower(regexp_extract({u}, '^[A-Za-z]+://([^/?#]+)', 1))"
    host = (
        f"regexp_replace(regexp_replace({hostport},"
        f" CASE WHEN {proto} = 'https' THEN ':443$' ELSE ':80$' END, ''),"
        " '^www\\\\.', '')"
    )
    path0 = f"regexp_extract({u}, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1)"
    path = (
        f"CASE WHEN {path0} != '/' THEN regexp_replace({path0}, '/$', '')"
        f" ELSE {path0} END"
    )
    params = (
        f"array_sort(filter(split(regexp_extract({u}, '\\\\?([^#]*)', 1), '&'),"
        " p -> p != '' AND NOT (p LIKE 'utm\\\\_%' OR p LIKE 'fbclid=%'"
        " OR p LIKE 'gclid=%' OR p LIKE 'ref=%')))"
    )
    q = (
        f"CASE WHEN size({params}) > 0"
        f" THEN concat('?', concat_ws('&', {params})) ELSE '' END"
    )
    return f"concat({proto}, '://', {host}, {path}, {q})"


def top_terms(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document distinctive terms — the TF-IDF keyword-extraction step
    with integer-exact ranking: order by term frequency desc, document
    frequency asc (rarer beats common at equal tf), token asc. Skipping the
    float log keeps the ranking bit-identical across engines while ranking
    the same way log-TF-IDF would for fixed tf (log is monotone in 1/df).

    Two hash aggregates (tf per (doc, token), df per token — both partial+
    final) + one broadcastable join + one window: corpus-scale shape.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token")
    )
    tf = toks.groupBy(id_col, "token").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("token").agg(F.count("*").alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tf"), F.asc("df"), F.asc("token")
    )
    return (
        tf.join(df_, "token")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "tf", "df", "rnk")
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_input: int | None = None,
) -> DataFrame:
    """Rolling-hash document fingerprints by winnowing (the task mandate's
    'document fingerprinting (rolling hash)'; the standard local
    fingerprinting scheme from the plagiarism/near-dup literature): hash
    every character k-gram, slide a window of ``window`` consecutive gram
    hashes, select each window's minimum (rightmost on ties), and emit the
    distinct selected (position, hash) pairs per document.

    Guarantee: any substring match of length >= window + k - 1 between two
    documents shares at least one fingerprint hash — so fingerprints
    support containment/overlap detection, not just whole-doc equality
    (which the md5 ``fingerprints`` cover).

    Shape: gram hashes explode to rows ((id, pos, hash) — the k-gram hash
    is xxhash64(substring); a polynomial rolling hash is an implementation
    detail of O(1) sliding that the vectorized substring makes
    unnecessary) and the window minimum is ONE frame-bounded window
    aggregate: O(n·w) per doc with a single shuffle on the doc key.
    (A nested higher-order-expression formulation is O(n²·w): Catalyst's
    projection collapse inlines the full gram-array expression into every
    window lambda — measured 50s on a 1.5k-char doc.) Struct minima give
    the (hash, rightmost-position) tie rule. Output: (id, pos, fp_hash),
    pos 1-based over gram starts."""
    from pyspark.sql import Window

    # spread the gram generation across the cluster BEFORE the explode: a
    # corpus read as a handful of input partitions would otherwise hash
    # millions of k-grams on as many cores (measured: the explode stage ran
    # 3 tasks at sf0.1 and dominated the operator). Repartitioning BY THE
    # DOC KEY costs one tiny shuffle of the doc rows and is then REUSED by
    # the window aggregate's partitionBy(id) — the wide gram rows
    # themselves never get an extra exchange, which is why this path keys
    # UNCONDITIONALLY (require_keyed) where shingles() keys only when
    # deficient: here the doc-key exchange exists either way, so paying it
    # on the small doc rows instead of the ~20x gram rows wins at any
    # scale. ``n_input`` hints the input partition count so composed
    # pipelines skip the plan-forcing probe (ADVICE r05).
    from demeter_spark.plans.bucketing import key_repartition

    docs = key_repartition(docs, id_col, n_input=n_input, require_keyed=True)

    n_grams = f"(length({text_col}) - {k} + 1)"
    grams = docs.selectExpr(
        id_col,
        # NB: sequence(1, 0) DESCENDS in Spark — guard short docs (same
        # gotcha as dedup.SHINGLE_EXPR); posexplode of array() emits none
        f"""CASE WHEN {n_grams} < 1 THEN array()
             ELSE transform(sequence(1, {n_grams}),
                            i -> xxhash64(substr({text_col}, i, {k})))
        END AS _g""",
    ).selectExpr(id_col, "posexplode(_g) AS (_p0, _h)").selectExpr(
        id_col, "_p0 + 1 AS _j", "_h"
    )
    wmin = (
        Window.partitionBy(id_col).orderBy("_j").rowsBetween(0, window - 1)
    )
    wcnt = Window.partitionBy(id_col)
    return (
        grams.withColumn(
            "_m",
            F.min(
                F.struct(F.col("_h").alias("h"), (-F.col("_j")).alias("negp"))
            ).over(wmin),
        )
        .withColumn("_n", F.count("*").over(wcnt))
        # one selection per window start j in 1..max(n-window+1, 1)
        .filter(
            F.col("_j")
            <= F.greatest(F.col("_n") - F.lit(window - 1), F.lit(1))
        )
        .select(
            id_col,
            (-F.col("_m.negp")).alias("pos"),
            F.col("_m.h").alias("fp_hash"),
        )
        .distinct()
    )
