"""Distributed BPE (byte-pair-encoding) vocabulary induction.

The tokenizer-training step of an LLM data pipeline: iteratively find
the most frequent adjacent symbol pair across the corpus and merge it
into a new symbol.  The reference library has no tokenizer surface;
this is the Spark-first formulation:

- Each round's pair count is ONE map-side-combined aggregation over the
  symbolized corpus (the q205 kernel): explode adjacent pairs, partial
  aggregate at the mappers, shuffle carries (a, b, count) — at most
  |vocab|^2 keys, never text.
- The winning pair is a 1-row ``take`` (scalar collect, not data).
- The merge is applied with a pure-Column ``aggregate()`` fold —
  greedy left-to-right non-overlapping, the standard BPE semantics —
  so symbol rewriting stays JVM-side with zero Python in the row path.
- The corpus is persisted each round and the previous round's relation
  unpersisted: plan depth stays O(1) per round instead of stacking
  transforms (the same literal-plan discipline as the k-means loop in
  ``operators/semdedup.py``).

Tie-break is deterministic: (count DESC, a ASC, b ASC) — the property
test in tests/test_bpe.py holds a pure-Python reference to the same
rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, n) adjacent-pair frequencies over weighted ``syms``
    arrays, with multiplicity (every occurrence in every word instance
    votes, overlaps included)."""
    # size==1 words have no pairs — and must be filtered BEFORE the
    # explode: sequence(1, 0) counts DOWN in Spark, indexing syms[1]
    # out of bounds under ANSI
    words = words.where(F.size("syms") >= 2)
    return (
        words.select(
            "w",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(syms) - 1),"
                    " i -> struct(syms[i - 1] AS a, syms[i] AS b))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "w")
        .groupBy("a", "b")
        .agg(F.sum("w").alias("n"))
    )


def _merge_expr(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b via an
    ``aggregate`` fold: append each symbol, collapsing when the running
    tail is ``a`` and the next symbol is ``b``.  Overlapping runs merge
    non-overlapping from the left ("aaa" + (a,a) -> ["aa", "a"])."""
    a_lit, b_lit = F.lit(a), F.lit(b)
    return F.aggregate(
        F.col("syms"),
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (not an ANSI error) on the empty
            # accumulator of the first fold step
            (F.try_element_at(acc, F.lit(-1)) == a_lit) & (x == b_lit),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(a_lit, b_lit)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def symbolize(df: DataFrame, words_col: str = "word") -> DataFrame:
    """Word occurrences -> weighted initial symbol arrays: the corpus
    collapses to its DISTINCT-word histogram first (how production BPE
    trainers run — pair votes weight by word frequency), so every merge
    round folds over |vocabulary| rows, not |corpus| occurrences."""
    # empty strings must be dropped BEFORE sequence(1, length(..)):
    # sequence(1, 0) counts DOWN (NOTES.md hazard), turning '' into a
    # garbage ["", ""] symbol array that would pass the pair filter
    return (
        df.where(F.length(words_col) > 0)
        .groupBy(words_col)
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.expr(
                f"transform(sequence(1, length({words_col})),"
                f" i -> substring({words_col}, i, 1))"
            ).alias("syms"),
            "w",
        )
    )


def bpe_train(
    words: DataFrame,
    n_merges: int,
    words_col: str = "word",
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over a one-column DataFrame of
    words (duplicates = frequency weight).  Returns
    ``[(a, b, count), ...]`` in merge order."""
    spark: SparkSession = words.sparkSession
    corpus = symbolize(words, words_col).persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    merges: list[tuple[str, str, int]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(corpus)
                .orderBy(F.desc("n"), "a", "b")
                .take(1)
            )
            if not top or top[0]["n"] < 1:
                break
            a, b, n = top[0]["a"], top[0]["b"], int(top[0]["n"])
            merges.append((a, b, n))
            nxt = corpus.select(
                _merge_expr(a, b).alias("syms"), "w"
            ).persist(StorageLevel.MEMORY_AND_DISK)
            nxt.count()
            corpus.unpersist()
            corpus = nxt
    finally:
        corpus.unpersist()
    return merges


def bpe_apply(
    df: DataFrame, merges: list[tuple[str, str, int]], words_col: str = "word"
) -> DataFrame:
    """Tokenize ``words_col`` with a learned merge list: symbolize then
    replay each merge's greedy fold in order.  Output column ``tokens``
    (array<string>)."""
    out = df.withColumn(
        "syms",
        # '' tokenizes to [], not to sequence(1, 0)'s down-counting
        # ["", ""] garbage (NOTES.md hazard)
        F.when(
            F.length(words_col) > 0,
            F.expr(
                f"transform(sequence(1, length({words_col})),"
                f" i -> substring({words_col}, i, 1))"
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    for a, b, _ in merges:
        out = out.withColumn("syms", _merge_expr(a, b))
    return out.withColumnRenamed("syms", "tokens")
