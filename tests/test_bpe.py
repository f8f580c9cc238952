"""BPE trainer: the distributed implementation must reproduce a
pure-Python reference BPE (greedy left-to-right merges, multiplicity
pair counts, (count DESC, a, b) tie-break) exactly — merges, counts and
tokenization.  This is the oracle for q210 (iterative trainers have no
single-SQL twin)."""

from __future__ import annotations

from collections import Counter

import pytest

from parquery_spark.operators.bpe import bpe_apply, bpe_train


def _py_pair_counts(corpus: list[list[str]]) -> Counter:
    c: Counter = Counter()
    for syms in corpus:
        for i in range(len(syms) - 1):
            c[(syms[i], syms[i + 1])] += 1
    return c


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in syms:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def _py_bpe(words: list[str], n_merges: int):
    corpus = [list(w) for w in words]
    merges = []
    for _ in range(n_merges):
        counts = _py_pair_counts(corpus)
        if not counts:
            break
        (a, b), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, n))
        corpus = [_py_merge(s, a, b) for s in corpus]
    return merges, corpus


WORDS = (
    ["banana"] * 5
    + ["bandana"] * 3
    + ["cabana", "anagram", "panama", "nan", "ana", "aa", "aaa", "aaaa"]
    + ["low", "lower", "lowest", "newer", "newest", "wider", "widest"] * 2
)


@pytest.fixture(scope="module")
def words_df(spark):
    return spark.createDataFrame([(w,) for w in WORDS], ["word"])


def test_bpe_train_matches_python_reference(spark, words_df):
    got = bpe_train(words_df, n_merges=6)
    want, _ = _py_bpe(WORDS, 6)
    assert got == want


def test_bpe_apply_matches_python_reference(spark, words_df):
    merges, want_corpus = _py_bpe(WORDS, 6)
    got = (
        bpe_apply(words_df, merges)
        .select("word", "tokens")
        .collect()
    )
    want = {}
    for w, toks in zip(WORDS, want_corpus):
        want[w] = toks
    for row in got:
        assert row["tokens"] == want[row["word"]], row["word"]


def test_bpe_overlapping_run_merges_left_to_right(spark):
    df = spark.createDataFrame([("aaa",), ("aaaa",)], ["word"])
    out = {
        r["word"]: r["tokens"]
        for r in bpe_apply(df, [("a", "a", 0)]).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    assert out["aaaa"] == ["aa", "aa"]


def test_bpe_train_stops_when_no_pairs(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["word"])
    assert bpe_train(df, n_merges=3) == []
