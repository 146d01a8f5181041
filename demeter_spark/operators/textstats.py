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


def _max_multiplicity_expr(arr_sql: str) -> str:
    """Max element multiplicity in a string array, O(L log L): sort, then
    one aggregate() fold tracking the current run length. Replaces the
    O(L^2) ``array_max(transform(array_distinct(a), g -> size(filter(a,
    x -> x = g))))`` scan — same integer result (0 for empty input), so
    oracles are unaffected; at web-corpus document lengths the quadratic
    kernel is the difference between a map-only pass and an unrunnable
    one. Elements must be non-NULL (split/concat_ws never yield NULL)."""
    return (
        f"aggregate(array_sort({arr_sql}),"
        " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),"
        " (a, x) -> IF(x <=> a.prev,"
        "   named_struct('prev', x, 'run', a.run + 1,"
        "                'best', GREATEST(a.best, a.run + 1)),"
        "   named_struct('prev', x, 'run', 1, 'best', GREATEST(a.best, 1))),"
        " a -> a.best)"
    )


def _dup_positions_expr(arr_sql: str) -> str:
    """Count of positions whose element occurs more than once, O(L log L)
    by the same sort + run-length fold (a run of length r > 1 contributes
    r: +2 when it first reaches 2, +1 per further extension). Replaces the
    O(L^2) ``size(filter(a, g -> size(filter(a, x -> x = g)) > 1))``."""
    return (
        f"aggregate(array_sort({arr_sql}),"
        " named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'acc', 0),"
        " (a, x) -> IF(x <=> a.prev,"
        "   named_struct('prev', x, 'run', a.run + 1,"
        "                'acc', a.acc + IF(a.run = 1, 2, 1)),"
        "   named_struct('prev', x, 'run', 1, 'acc', a.acc)),"
        " a -> a.acc)"
    )


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

    O(L log L) per doc (sort + run-length fold, _max_multiplicity_expr)
    inside codegen — cheaper than a groupBy explode at corpus scale
    because nothing leaves the row.
    """
    return docs.selectExpr(
        id_col,
        f"split({text_col}, ' ') AS _w",
    ).selectExpr(
        id_col,
        "CAST(size(_w) AS INT) AS n_words",
        f"CAST({_max_multiplicity_expr('_w')} AS INT) AS top_word_n",
        "CAST(size(array_distinct(_w)) AS INT) AS _n_types",
        "CAST(size(array_intersect(_w,"
        " array('the','a','of','and','to','in','is'))) AS INT) AS n_stop",
    ).selectExpr(
        id_col,
        "n_words",
        "top_word_n",
        "CAST(top_word_n AS DOUBLE) / n_words AS top_word_frac",
        "CAST(_n_types AS DOUBLE) / n_words AS ttr",
        "n_stop",
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
    unique_per_doc: bool = False,
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

    Shape (r06, measured): per-document VECTORIZED winnowing inside the
    Arrow batch — a narrow mapInPandas with ZERO shuffle and no gram-row
    materialization. The gram hash is a polynomial rolling hash over code
    points mod 2^64 (base 1099511628211 — an odd 64-bit constant; hash
    identity only needs cross-document consistency, and the pytest
    re-derives both the hashes and the selection independently in pure
    Python); the window minimum is a numpy sliding-window argmin with the
    rightmost-tie rule. The r05 Catalyst formulation (gram explode + ONE
    frame-bounded window aggregate) was already single-shuffle, but it
    materialized and sorted gram rows ~20x the text bytes in the JVM —
    measured 3.4 s of q7's 5.1 s at sf0.1; this path computes the same
    selection in O(n·w) per doc with small numpy constants and no JVM
    fan-out at any scale. (The nested higher-order-expression formulation
    remains off the table: Catalyst's projection collapse makes it
    O(n²·w) — measured 50 s on a 1.5k-char doc in r04.) Output:
    (id, pos, fp_hash), pos 1-based over gram starts, distinct per doc.

    Parallelism: deficient inputs are widened by the shared
    ``key_repartition`` policy (same conditional rule as ``shingles`` —
    the per-doc kernel is embarrassingly parallel, so a corpus read as a
    handful of partitions would otherwise fingerprint on as many cores;
    a well-partitioned corpus is left alone). ``n_input`` hints the input
    partition count so composed pipelines skip the plan-forcing probe
    (ADVICE r05).

    ``unique_per_doc`` (r07): emit the per-document DISTINCT hash set as
    (id, fp_hash) — no pos column — deduplicated inside the kernel
    (np.unique per doc, map-side) so set-oriented consumers
    (containment_pairs & the incremental skin) skip the full
    .distinct() shuffle of the fingerprint fan-out; the row set equals
    select(id, fp_hash).distinct() of the positional output exactly."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    from demeter_spark.plans.bucketing import key_repartition

    docs = key_repartition(
        docs.select(id_col, text_col), id_col, n_input=n_input
    )
    base = np.uint64(1099511628211)
    kk, ww = int(k), int(window)

    def _win(batches):
        for pdf in batches:
            # numpy-array accumulation + one concatenate per batch (r07):
            # the former per-doc .tolist()/extend built python lists of
            # millions of elements and dominated the kernel at real doc
            # lengths
            ids_l: list = []
            pos_l: list = []
            hash_l: list = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                if t is None:
                    continue
                # utf-32 decode = exact code-point semantics (positions
                # count CHARACTERS, matching substr in the r05 path)
                c = np.frombuffer(
                    t.encode("utf-32-le"), dtype="<u4"
                ).astype(np.uint64)
                n = len(c) - kk + 1
                if n < 1:
                    continue  # shorter than k: no grams, no fingerprints
                h = np.zeros(n, dtype=np.uint64)
                for j in range(kk):  # k vector ops; wraparound mod 2^64
                    h = h * base + c[j : j + n]
                # minima are taken in SIGNED int64 order — the order the
                # emitted BIGINT column carries, so selection and stored
                # hash agree (and downstream signed comparisons match)
                s = h.view(np.int64)
                m = n - ww + 1
                if m < 1:
                    # fewer grams than the window: one window of all grams
                    a = int(np.argmin(s[::-1]))  # first in rev = rightmost
                    sel = np.array([n - 1 - a])
                else:
                    am = np.argmin(sliding_window_view(s, ww)[:, ::-1], axis=1)
                    sel = np.unique(np.arange(m) + (ww - 1 - am))
                if unique_per_doc:
                    hv = np.unique(s[sel])
                    ids_l.append(np.full(len(hv), did, dtype=np.int64))
                    hash_l.append(hv)
                else:
                    ids_l.append(np.full(len(sel), did, dtype=np.int64))
                    pos_l.append((sel + 1).astype(np.int32))
                    hash_l.append(s[sel])

            def cat(lst, dt):
                return np.concatenate(lst) if lst else np.array([], dtype=dt)

            cols = {id_col: cat(ids_l, np.int64)}
            if not unique_per_doc:
                cols["pos"] = cat(pos_l, np.int32)
            cols["fp_hash"] = cat(hash_l, np.int64)
            yield pd.DataFrame(cols)

    if unique_per_doc:
        return docs.mapInPandas(_win, f"{id_col} BIGINT, fp_hash BIGINT")
    return docs.mapInPandas(
        _win, f"{id_col} BIGINT, pos INT, fp_hash BIGINT"
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 3,
    max_top_frac: float = 0.18,
    max_dup_frac: float = 0.60,
) -> DataFrame:
    """Gopher-style n-gram repetition signals (the published web-corpus
    repetition filters the reference-era pipelines gate training data on):

    - top{top_n}gram_frac: words covered by the single most frequent word
      ``top_n``-gram / n_words (the 'fraction of characters in the most
      common n-gram' rule, word-denominated so Spark and the SQL oracle
      agree exactly),
    - dup{dup_n}gram_frac: fraction of ``dup_n``-gram positions whose gram
      occurs more than once in the document (the 'fraction of characters in
      duplicate n-grams' rule),
    - keep_repetition: the conjunction gating the training set.

    Everything stays inside one row — grams built with transform(sequence)
    over the word array, multiplicities via the sorted run-length folds
    (_max_multiplicity_expr / _dup_positions_expr, O(L log L) per document)
    inside whole-stage codegen, ZERO shuffle: at 100 TB this is a map-only
    pass over the corpus (the explode+groupBy alternative ships every gram
    through an exchange). Formerly nested-filter O(L^2) — quadratic per-doc
    cost is the difference between a scan and a stall on real web pages.

    Reference anchor: the reference has no text stack (raster/vector only,
    demeter/raster/__init__.py); this covers the webtext payload axis.
    """
    def grams(n: int) -> str:
        # gram starting at 1-based word i, i in 1 .. L-n+1. The guard matters:
        # Spark's sequence(1, 0) is DESCENDING [1, 0], not empty, and
        # slice(_, 0, n) throws — so short docs must short-circuit to array().
        # _w MUST be a materialized column, never the split() expression
        # inline: an expression inside the transform lambda is re-evaluated
        # PER ELEMENT (measured: re-splitting the text per gram made this
        # O(L^2) — 47 s for 4M tokens; the column reference is O(1)).
        return (
            f"CASE WHEN size(_w) >= {n} THEN"
            f" transform(sequence(1, size(_w) - {n - 1}),"
            f" i -> concat_ws(' ', slice(_w, i, {n})))"
            " ELSE array() END"
        )

    return docs.selectExpr(
        id_col,
        f"split({text_col}, ' ') AS _w",
    ).selectExpr(
        id_col,
        "size(_w) AS n_words",
        f"{grams(top_n)} AS _gt",
        f"{grams(dup_n)} AS _gd",
    ).selectExpr(
        id_col,
        "n_words",
        f"CAST({_max_multiplicity_expr('_gt')} AS INT) AS top_gram_n",
        f"CAST({_dup_positions_expr('_gd')} AS INT) AS dup_gram_n",
        "CAST(size(_gd) AS INT) AS n_dup_positions",
    ).selectExpr(
        id_col,
        "n_words",
        "top_gram_n",
        f"CAST(top_gram_n * {top_n} AS DOUBLE) / n_words AS top_gram_frac",
        "dup_gram_n",
        "CASE WHEN n_dup_positions > 0 THEN CAST(dup_gram_n AS DOUBLE)"
        " / n_dup_positions ELSE CAST(0 AS DOUBLE) END AS dup_gram_frac",
    ).selectExpr(
        id_col,
        "n_words",
        "top_gram_n",
        "top_gram_frac",
        "dup_gram_n",
        "dup_gram_frac",
        f"CAST(CASE WHEN top_gram_frac <= {max_top_frac}e0"
        f" AND dup_gram_frac <= {max_dup_frac}e0"
        " THEN 1 ELSE 0 END AS INT) AS keep_repetition",
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 6,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-level boilerplate detection (CCNet-style shared-span removal,
    word-gram denominated): for each document, the fraction of its DISTINCT
    word ``n``-grams that also occur in at least ``min_docs`` documents
    overall. Documents dominated by corpus-shared spans (navigation chrome,
    templated legal text) score high and are flagged.

    Scale shape: distinct grams per doc are exploded once and aggregated by
    gram — ONE shuffle keyed on the gram (high cardinality, naturally
    balanced; no hot keys because grams shared by everything are exactly the
    boilerplate being counted and still spread across hash partitions by
    gram text). The doc-side rollup reuses the doc_id partitioning. No
    all-pairs comparison anywhere — cost is O(total grams), the same
    discipline as the MinHash/shingle stack (operators/dedup.py).
    """
    # same short-doc guard as repetition_stats: sequence(1, 0) is [1, 0];
    # _w materialized first (inline split in the lambda = O(L^2) re-split)
    grams = (
        f"CASE WHEN size(_w) >= {n} THEN"
        f" array_distinct(transform(sequence(1, size(_w) - {n - 1}),"
        f" i -> concat_ws(' ', slice(_w, i, {n}))))"
        " ELSE array() END"
    )
    per_doc = docs.selectExpr(
        id_col, f"split({text_col}, ' ') AS _w"
    ).selectExpr(id_col, f"explode({grams}) AS gram")
    gram_docs = per_doc.groupBy("gram").agg(
        F.count("*").alias("gram_docs")  # per_doc grams are distinct per doc
    )
    return (
        per_doc.join(gram_docs, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_grams"),
            F.sum((F.col("gram_docs") >= min_docs).cast("int"))
            .cast("int")
            .alias("n_shared"),
        )
        .selectExpr(
            id_col,
            "n_grams",
            "n_shared",
            "CAST(n_shared AS DOUBLE) / n_grams AS shared_frac",
            "CAST(CASE WHEN CAST(n_shared AS DOUBLE) / n_grams > 0.5"
            " THEN 1 ELSE 0 END AS INT) AS boilerplate",
        )
    )


def bigram_lm_train(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Corpus bigram language model as a count table: one row per observed
    transition ``g`` = "w1 w2" with ``c_bg`` (corpus occurrences of the
    bigram) and ``c_pre`` (corpus occurrences of w1 as a transition
    prefix), so P(w2|w1) = c_bg / c_pre over the transition multiset.

    The CCNet recipe scores web documents under a corpus LM and gates on
    perplexity; this is that model's exact count core, kept integer so the
    scoring pass stays bit-exact cross-engine (log/exp are the known
    non-oracle-safe transcendentals — tests/test_reproject.py).

    Scale: grams explode map-side, then ONE hash aggregate each for
    bigram and prefix counts (map-side combined; distinct observed bigrams
    are corpus-bounded and heavy-tailed, the classic LM-training shuffle).
    The model is a dimension table relative to the corpus.

    Input parallelism: deficient inputs are widened by the shared
    ``key_repartition`` policy (r07: the corpus parquet arrives as a
    handful of partitions in the sandbox and the gram explode + count map
    side ran on as many cores — the identical deficiency shingles and
    winnowing already guard against).
    """
    from demeter_spark.plans.bucketing import key_repartition

    docs = key_repartition(docs.select(id_col, text_col), id_col)
    trans = docs.selectExpr(
        id_col, f"split({text_col}, ' ') AS _w"
    ).selectExpr(
        id_col,
        "CASE WHEN size(_w) >= 2 THEN"
        # zip of shifted slices, not per-element slice+concat_ws: the
        # slices materialize once per row, so the lambda is one concat
        # per element (r07: ~2x on the gram explode, same strings)
        " zip_with(slice(_w, 1, size(_w) - 1),"
        "          slice(_w, 2, size(_w) - 1),"
        "          (a, b) -> concat(a, ' ', b))"
        " ELSE array() END AS _gt",
    ).select(F.explode("_gt").alias("g"))
    bg = trans.groupBy("g").agg(F.count(F.lit(1)).alias("c_bg"))
    pre = (
        trans.select(F.split(F.col("g"), " ").getItem(0).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c_pre"))
    )
    return bg.withColumn("w1", F.split(F.col("g"), " ").getItem(0)).join(
        pre, "w1"
    ).select("g", "c_bg", "c_pre")


def bigram_surprise(
    docs: DataFrame,
    model: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    max_improbable_frac: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document LM-surprise signals under a corpus bigram model — the
    CCNet perplexity-filter analogue, integer-exact for the oracle gate:

    - lm_n_trans: transitions scored,
    - lm_n_improbable: transitions with P(w2|w1) < 1/k, tested as the
      integer comparison ``c_bg * k < c_pre`` (no division, no log —
      bit-exact in every engine),
    - lm_sum_cbg: summed bigram counts (integer => order-independent, so
      the groupBy re-aggregation is hash-safe despite shuffle order),
    - lm_improbable_frac: the one float, a single division of two exact
      integers (correctly rounded identically everywhere),
    - keep_lm: gate at ``max_improbable_frac``.

    ``model=None`` trains on ``docs`` itself (self-scoring, the CCNet
    in-domain setup; every transition is then in-vocabulary so the inner
    join drops nothing). Scale: the model is broadcast when
    ``broadcast_model`` (vocabulary-sized — correct for any real corpus);
    set False to force a shuffle join keyed on the gram for adversarial
    vocabularies, where AQE handles head-gram skew.
    """
    from demeter_spark.plans.bucketing import key_repartition

    # widen a deficient input ONCE; self-training reuses the widened frame
    # so the raw text shuffles at most once (r07 — see bigram_lm_train)
    docs = key_repartition(docs.select(id_col, text_col), id_col)
    if model is None:
        model = bigram_lm_train(docs, id_col=id_col, text_col=text_col)
    # _w materialized first: split() inline in the lambda would re-split
    # per element (the O(L^2) hazard fixed in repetition_stats)
    trans = docs.selectExpr(
        id_col, f"split({text_col}, ' ') AS _w"
    ).selectExpr(
        id_col,
        "CASE WHEN size(_w) >= 2 THEN"
        # zip of shifted slices, not per-element slice+concat_ws: the
        # slices materialize once per row, so the lambda is one concat
        # per element (r07: ~2x on the gram explode, same strings)
        " zip_with(slice(_w, 1, size(_w) - 1),"
        "          slice(_w, 2, size(_w) - 1),"
        "          (a, b) -> concat(a, ' ', b))"
        " ELSE array() END AS _gt",
    ).select(id_col, F.explode("_gt").alias("g"))
    m = F.broadcast(model) if broadcast_model else model
    scored = trans.join(m, "g").groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("lm_n_trans"),
        F.sum(
            F.when(
                F.col("c_bg") * F.lit(k) < F.col("c_pre"), F.lit(1)
            ).otherwise(F.lit(0))
        )
        .cast("int")
        .alias("lm_n_improbable"),
        F.sum("c_bg").cast("bigint").alias("lm_sum_cbg"),
    )
    return scored.selectExpr(
        id_col,
        "lm_n_trans",
        "lm_n_improbable",
        "lm_sum_cbg",
        "CAST(lm_n_improbable AS DOUBLE) / lm_n_trans AS lm_improbable_frac",
        f"CAST(CASE WHEN CAST(lm_n_improbable AS DOUBLE) / lm_n_trans"
        f" <= {max_improbable_frac}e0 THEN 1 ELSE 0 END AS INT) AS keep_lm",
    )


# PII patterns — deliberately restricted to the regex subset where Java
# (Spark) and RE2 (DuckDB) agree exactly: character classes, bounded
# quantifiers, grouping; no backrefs, no lookaround, and NO backslashes
# (SQL string-literal escape rules differ between the engines — '[.]'
# and '[+]' express the literals portably).
PII_PATTERNS = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}",
    "ipv4": "([0-9]{1,3}[.]){3}[0-9]{1,3}",
    "phone": "[+][0-9][0-9() -]{6,14}[0-9]",
}


def pii_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction signals — the scrub stage every
    training-data pipeline runs before release (the public C4/Dolma-style
    recipe: regex matches for emails / bare IPv4s / international phone
    numbers, replaced by typed placeholder tokens).

    Per-doc output: n_email / n_ipv4 / n_phone match counts, pii_free
    flag, and redacted_fp = md5 of the text with every match replaced by
    its <TYPE> placeholder (md5 keeps the oracle row narrow; the
    redaction itself is the same regexp_replace chain). Map-only, zero
    shuffle, no Python — counts via regexp_count, redaction via chained
    regexp_replace, all inside whole-stage codegen.
    """
    email, ipv4, phone = (
        PII_PATTERNS["email"],
        PII_PATTERNS["ipv4"],
        PII_PATTERNS["phone"],
    )
    red = (
        f"regexp_replace(regexp_replace(regexp_replace({text_col},"
        f" '{email}', '<EMAIL>'),"
        f" '{ipv4}', '<IP>'),"
        f" '{phone}', '<PHONE>')"
    )
    return docs.selectExpr(
        id_col,
        f"CAST(size(regexp_extract_all({text_col}, '{email}', 0)) AS INT)"
        " AS n_email",
        f"CAST(size(regexp_extract_all({text_col}, '{ipv4}', 0)) AS INT)"
        " AS n_ipv4",
        f"CAST(size(regexp_extract_all({text_col}, '{phone}', 0)) AS INT)"
        " AS n_phone",
        f"md5({red}) AS redacted_fp",
    ).selectExpr(
        id_col,
        "n_email",
        "n_ipv4",
        "n_phone",
        "CAST(CASE WHEN n_email + n_ipv4 + n_phone = 0 THEN 1 ELSE 0 END"
        " AS INT) AS pii_free",
        "redacted_fp",
    )


def html_to_text_expr(html_col: str) -> str:
    """General HTML -> visible text as ONE Catalyst expression chain —
    the real-crawl counterpart of synth.extract_text_expr (which inverts
    only the fixture template). Public-recipe extraction: drop
    script/style/head subtrees, honor block boundaries as newlines,
    strip remaining tags, decode the common entities, collapse
    whitespace. Map-only regexp_replace chain, no UDF — fuses into the
    corpus scan. Lossy by design (it is an extractor, not a parser):
    comments and CDATA fall to the tag-strip rule."""
    s = f"decode({html_col}, 'UTF-8')"
    # kill non-content subtrees (case-insensitive, dotall, non-greedy)
    for tag in ("script", "style", "head"):
        s = f"regexp_replace({s}, '(?is)<{tag}[^>]*>.*?</{tag}>', ' ')"
    # block-level closers -> newline so paragraphs survive the strip
    s = (
        f"regexp_replace({s},"
        " '(?i)</(p|div|h[1-6]|li|tr|article|section)>|<br[^>]*>', '\\n')"
    )
    s = f"regexp_replace({s}, '<[^>]*>', ' ')"  # strip remaining tags
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # LAST: double-escaped entities decode one level
    ):
        lit = ch.replace("\\", "\\\\").replace("'", "\\'")
        s = f"replace({s}, '{ent}', '{lit}')"
    # collapse horizontal runs, trim line edges, collapse blank lines
    s = f"regexp_replace({s}, '[ \\t]+', ' ')"
    s = f"regexp_replace({s}, ' ?\\n ?', '\\n')"
    s = f"regexp_replace({s}, '\\n+', '\\n')"
    return f"trim({s})"


def extract_page_text(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(url, text) from stored HTML bytes via html_to_text_expr."""
    return pages.selectExpr(
        f"{url_col} AS url", f"{html_to_text_expr(html_col)} AS text"
    )


def main_content_blocks(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    min_text_chars: int = 25,
    max_link_ratio: float = 0.4,
) -> DataFrame:
    """Block-level boilerplate removal — the text-density heuristic of
    the readability/boilerpipe line: split the document into block
    elements, score each by visible-text length and anchor-text ratio,
    keep content blocks (long text, few links); navigation/footer chrome
    is short and link-dense and drops out. One map-only pass: the split
    produces the per-block array and every per-block regexp operates on
    the lambda ELEMENT (linear total — the inline-outer-expression
    hazard does not apply to element-local work). Output one row per
    kept block: (url, block_no, text, n_chars, link_ratio)."""
    doc = f"decode({html_col}, 'UTF-8')"
    blocks = (
        f"split({doc},"
        " '(?i)</(p|div|h[1-6]|li|ul|ol|section|article|td|blockquote"
        "|table|nav|header|footer)>')"
    )
    # per block: anchor inner text length vs total visible text
    visible = (
        "trim(regexp_replace(regexp_replace(regexp_replace(b,"
        " '(?is)<(script|style)[^>]*>.*?</(script|style)>', ' '),"
        " '<[^>]*>', ' '), '\\\\s+', ' '))"
    )
    link_txt = (
        "aggregate(regexp_extract_all(b, '(?is)<a[^>]*>([^<]*)</a>', 1),"
        " 0, (m, t) -> m + length(trim(t)))"
    )
    return (
        pages.selectExpr(
            f"{url_col} AS url",
            f"posexplode({blocks}) AS (block_no, b)",
        )
        .selectExpr(
            "url",
            "block_no",
            f"{visible} AS text",
            f"CAST({link_txt} AS INT) AS link_chars",
        )
        .selectExpr(
            "url",
            "block_no",
            "text",
            "CAST(length(text) AS INT) AS n_chars",
            "CASE WHEN length(text) > 0 THEN CAST(link_chars AS DOUBLE)"
            " / length(text) ELSE 1e0 END AS link_ratio",
        )
        .where(
            f"n_chars >= {min_text_chars}"
            f" AND link_ratio <= {max_link_ratio}e0"
        )
    )


def readability(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease signals — the classic surface-readability
    quality feature. Syllables are approximated as vowel GROUPS per word
    (the standard regex heuristic; silent-e and diphthong corrections
    change scores by a few points, not orderings), sentences as
    [.!?]+ runs with a floor of 1. Map-only, one pass, no UDF:

        flesch = 206.835 - 1.015*(words/sentences)
                         - 84.6*(syllables/words)
    """
    return docs.selectExpr(
        id_col,
        f"CAST(size(split({text_col}, ' ')) AS INT) AS n_words",
        f"CAST(greatest(1, size(regexp_extract_all({text_col},"
        " '[.!?]+', 0))) AS INT) AS n_sentences",
        f"CAST(greatest(size(split({text_col}, ' ')),"
        f" size(regexp_extract_all(lower({text_col}),"
        " '[aeiouy]+', 0))) AS INT) AS n_syllables",
    ).selectExpr(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        "206.835e0 - 1.015e0 * (CAST(n_words AS DOUBLE) / n_sentences)"
        " - 84.6e0 * (CAST(n_syllables AS DOUBLE) / n_words)"
        " AS flesch",
    )


def compression_ratio(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """zlib compression ratio per document — the information-density
    quality signal (boilerplate and generated spam compress far better
    than natural prose; the public web-corpus recipes gate on it).
    Arrow-batched mapInPandas kernel (zlib is not expressible in
    Catalyst); one map-only pass, rows never leave their partition.
    ratio = deflate_len / max(1, raw_len); short docs -> ratio near or
    above 1 (header overhead), repetitive docs -> near 0."""
    import pandas as pd

    id_type = dict(docs.dtypes)[id_col]

    def _k(batches):
        import zlib

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "raw_len": raw.str.len().astype("int32"),
                    "deflate_len": raw.map(
                        lambda b: len(zlib.compress(b, 6))
                    ).astype("int32"),
                }
            )

    out = docs.select(id_col, text_col).mapInPandas(
        _k, f"{id_col} {id_type}, raw_len int, deflate_len int"
    )
    return out.selectExpr(
        id_col,
        "raw_len",
        "deflate_len",
        "CAST(deflate_len AS DOUBLE) / greatest(1, raw_len)"
        " AS compression_ratio",
    )
