"""Distributed BPE training/encoding vs a pure-Python reference
implementation of the Sennrich et al. (2016) algorithm with the same
deterministic tie-break (count DESC, pair lexicographic ASC)."""

import collections

import pytest
from pyspark.sql import functions as F

from demeter_spark.operators import tokenizer as tok

CORPUS = [
    ("d1", "low lower lowest low low"),
    ("d2", "new newer newest new new new"),
    ("d3", "wide wider widest low new"),
    ("d4", "the new low bridge is wider than the old one"),
    ("d5", "it's 100% UTF-safe: naïve café — low cost"),
]


def _ref_word_freq(corpus):
    wf = collections.Counter()
    for _, text in corpus:
        wf.update(w for w in text.split() if w)
    return wf


def _ref_apply_merge(syms, left, right):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(corpus, n_merges, min_count=2):
    wf = _ref_word_freq(corpus)
    vocab = {w: list(w) + [tok.END_OF_WORD] for w in wf}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += wf[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_count:
            break
        merges.append(best[0])
        vocab = {
            w: _ref_apply_merge(s, *best[0]) for w, s in vocab.items()
        }
    return merges


def _ref_encode(word, ranks):
    syms = list(word) + [tok.END_OF_WORD]
    while len(syms) >= 2:
        cand = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in ranks
        ]
        if not cand:
            break
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id string, text string")


def test_word_frequencies_match_counter(spark, docs):
    got = {
        r["word"]: r["n"]
        for r in tok.word_frequencies(docs).collect()
    }
    assert got == dict(_ref_word_freq(CORPUS))


def test_bpe_train_matches_reference_merge_sequence(spark, docs):
    n = 24
    got = tok.bpe_train(docs, n, checkpoint_every=6)
    want = _ref_train(CORPUS, n)
    assert got == want
    assert len(got) >= 10  # the fixture is rich enough to be a real test


def test_apply_merge_self_adjacent_nonoverlap(spark):
    # aaa + (a,a) -> [aa, a, EOW]; aaaa -> [aa, aa, EOW]
    df = spark.createDataFrame(
        [("x", "aaa aaaa")], "doc_id string, text string"
    )
    vocab = tok._initial_symbols(tok.word_frequencies(df))
    merged = {
        r["word"]: r["syms"]
        for r in tok._apply_merge(vocab, "a", "a").collect()
    }
    assert merged["aaa"] == ["aa", "a", tok.END_OF_WORD]
    assert merged["aaaa"] == ["aa", "aa", tok.END_OF_WORD]


def test_apply_merge_quote_symbols(spark):
    # symbols containing quotes survive the SQL-literal path ("it's")
    df = spark.createDataFrame([("x", "''")], "doc_id string, text string")
    vocab = tok._initial_symbols(tok.word_frequencies(df))
    merged = tok._apply_merge(vocab, "'", "'").collect()[0]["syms"]
    assert merged == ["''", tok.END_OF_WORD]


def test_bpe_encode_matches_reference(spark, docs):
    merges = _ref_train(CORPUS, 16)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: (r["tokens"], r["n_tokens"])
        for r in tok.bpe_encode(docs, merges).collect()
    }
    for doc_id, text in CORPUS:
        want = [t for w in text.split() for t in _ref_encode(w, ranks)]
        assert got[doc_id] == (want, len(want)), doc_id
    # every token either ends a word or is an in-word piece; rebuilding the
    # text from tokens is lossless (the tokenizer invariant)
    for doc_id, text in CORPUS:
        rebuilt = (
            "".join(got[doc_id][0])
            .replace(tok.END_OF_WORD, " ")
            .strip()
        )
        assert rebuilt == " ".join(text.split())


def test_merge_loop_runs_on_vocab_not_corpus(spark, docs):
    # the pair-count input is the vocabulary table: row count == distinct
    # words, NOT corpus word occurrences (the 100 TB scaling property)
    vocab = tok._initial_symbols(tok.word_frequencies(docs))
    assert vocab.count() == len(_ref_word_freq(CORPUS))


def test_merges_table_roundtrip(spark):
    merges = [("l", "o"), ("lo", "w")]
    t = tok.merges_table(spark, merges)
    rows = sorted(t.collect(), key=lambda r: r["rank"])
    assert [(r["left"], r["right"]) for r in rows] == merges
