"""Distributed BPE tokenizer training + encoding over a document corpus.

A large-scale training-data pipeline trains its tokenizer on the corpus it
curates; the reference engine has no tokenizer stage (its text handling ends
at attribute tables — e.g. /root/reference/demeter/db/_postgres.py builds SQL
over text columns), so this module is a beyond-reference, webtext-axis
operator designed Spark-first.

Scaling shape (the published BPE-at-scale recipe, Sennrich et al. 2016 §3 —
"we only need to count pairs once per word type"):

1. ONE corpus-sized pass reduces documents to a WORD-FREQUENCY table
   (groupBy word, map-side combined; vocabulary-bounded, heavy-tailed).
2. Every merge iteration then runs over the vocab table only: explode
   adjacent symbol pairs weighted by word count, ONE hash aggregate, a
   LIMIT-1 argmax to the driver (a single row), and a fold that rewrites
   each word's symbol array. At 100 TB the corpus pass is the cost; the
   merge loop costs O(n_merges * |vocab|) regardless of corpus size.
3. The evolving vocab table is ``localCheckpoint``-ed every few rounds so
   the logical plan does not grow linearly with merge count (same
   discipline as the connected-components contraction loop, dedup.py).

Encoding applies the learned ranked merges with an Arrow-batched
``mapInPandas`` kernel (the greedy lowest-rank loop is inherently
sequential per word — the documented Pandas-UDF escape hatch), with the
merge table broadcast by closure (tokenizer-sized, never corpus-sized).
Determinism: argmax tie-break is (count DESC, left ASC, right ASC), fixed
and engine-independent, so retraining on the same corpus is bit-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "▁"  # lower-one-eighth block, the sentencepiece marker


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Corpus -> (word, n) frequency table: the single corpus-sized pass.

    Words are whitespace tokens; empty tokens (from repeated spaces) are
    dropped. Output is vocabulary-sized.

    Deficient input parallelism is widened by the shared key_repartition
    policy (r07): a corpus read as one parquet partition would otherwise
    run the explode map side on one core.
    """
    from demeter_spark.plans.bucketing import key_repartition

    docs = key_repartition(docs.select(text_col), text_col)
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(vocab: DataFrame) -> DataFrame:
    """(word, n) -> (word, n, syms): characters plus the end-of-word mark
    as a trailing separate symbol, the classic BPE word representation."""
    return vocab.withColumn(
        "syms",
        F.concat(
            F.split(F.col("word"), ""),  # one element per character
            F.array(F.lit(END_OF_WORD)),
        ),
    )


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency — one explode over
    the VOCAB table (never the corpus) + one map-side-combined aggregate."""
    pairs = vocab_syms.select(
        F.col("n"),
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN"
                " transform(sequence(0, size(syms) - 2),"
                "  i -> struct(syms[i] AS left, syms[i + 1] AS right))"
                " ELSE array() END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(
        F.sum("n").alias("count")
    )


def _apply_merge(vocab_syms: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every word's symbol array, merging leftmost-first
    non-overlapping (left, right) runs — the standard greedy BPE pass,
    expressed as ONE Catalyst aggregate() fold per word (no UDF).

    The fold carries (acc_array, just_merged): when the accumulator's last
    symbol == left and the incoming symbol == right AND the last symbol was
    not itself produced by this round's merge, replace the last element
    with left||right; otherwise append. The just_merged flag implements
    non-overlap for self-adjacent pairs (aaa + (a,a) -> [aa, a], and
    aaaa -> [aa, aa], matching reference BPE).
    """
    merged = left + right
    expr = (
        "aggregate(syms,"
        " struct(CAST(array() AS array<string>) AS acc,"
        "        false AS just_merged),"
        " (st, s) -> CASE"
        "   WHEN NOT st.just_merged"
        # try_element_at: NULL (not an ANSI error) on the empty accumulator,
        # and NULL = x is NULL -> falls through to ELSE, as intended
        f"    AND try_element_at(st.acc, -1) = {_lit(left)}"
        f"    AND s = {_lit(right)}"
        f"   THEN struct(concat(slice(st.acc, 1, size(st.acc) - 1),"
        f"               array({_lit(merged)})) AS acc, true AS just_merged)"
        "   ELSE struct(concat(st.acc, array(s)) AS acc,"
        "               false AS just_merged) END,"
        " st -> st.acc)"
    )
    return vocab_syms.withColumn("syms", F.expr(expr))


def _lit(s: str) -> str:
    """SQL string literal with quote escaping (symbols come from corpus
    text and may contain quotes)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    min_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ranked
    merge list [(left, right), ...] (rank = list position).

    Stops early when no pair reaches ``min_count`` (vocabulary exhausted).
    Tie-break: count DESC, then (left, right) lexicographic ASC —
    deterministic across engines and partitionings because the pair counts
    are exact integers (order-independent sums).
    """
    vocab = _initial_symbols(word_frequencies(docs, text_col)).select(
        "n", "syms"
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(
                F.desc("count"), F.asc("left"), F.asc("right")
            )
            .limit(1)
            .collect()  # single argmax row per round — driver-sized
        )
        if not top or top[0]["count"] < min_count:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        vocab = _apply_merge(vocab, left, right)
        if (i + 1) % checkpoint_every == 0:
            # bound logical-plan growth across rounds (dedup.py discipline)
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def merges_table(spark, merges: list[tuple[str, str]]) -> DataFrame:
    """Merge list -> (rank, left, right) dimension table (broadcast-sized)."""
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(merges)],
        "rank INT, left STRING, right STRING",
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize documents with the learned merges: (id, tokens, n_tokens).

    Per-word greedy lowest-rank merging is sequential (each merge changes
    the neighbor structure), so this is a legitimate Arrow-batched
    ``mapInPandas`` kernel — the merge-rank dict rides the closure
    (tokenizer-sized) and each batch is processed with a word-level memo
    cache, so the per-batch cost is O(distinct words), mirroring the
    training-side vocab reduction.
    """
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} string, tokens array<string>, n_tokens int"

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [END_OF_WORD]
        while len(syms) >= 2:
            best, best_rank = None, None
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = j, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        memo[word] = syms
        return syms

    def _encode(batches):
        memo: dict = {}
        for pdf in batches:
            toks = [
                [
                    t
                    for w in str(text).split()
                    for t in _encode_word(w, memo)
                ]
                for text in pdf[text_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype(str),
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    from demeter_spark.plans.bucketing import key_repartition

    # widen a deficient input so the per-word kernel runs on every core,
    # not on as many cores as the corpus has parquet partitions (r07)
    narrow = key_repartition(docs.select(id_col, text_col), id_col)
    return narrow.mapInPandas(_encode, out_schema)
