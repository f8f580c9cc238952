"""Mergeable sketch aggregates: HyperLogLog distinct-count sketches and
quantile summaries that can be computed once per partition/day/shard and
re-merged later — the pattern that makes 100 TB rollups incremental
instead of recomputed.

Why sketches and not exacts: ``count_distinct`` over a 100 TB corpus
shuffles every distinct value; an HLL sketch is a few KB per group,
mergeable associatively, so daily sketches roll up to monthly/all-time
without touching raw data again.  (Spark's Expand-based exact
count_distinct stays available via ``aggregate_pq`` — these are the
incremental path.)

Built on Spark's Datasketches-backed ``hll_sketch_agg`` /
``hll_union_agg`` (SQL standard sketches since 3.5).  No SQL-engine
oracle: sketch binaries are implementation-defined — correctness is
asserted against exact counts with the algorithm's error bound instead
(see tests).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(col: str, lg_k: int = 12) -> Column:
    """HLL sketch aggregate (binary, mergeable); relative error ≈
    1.04/sqrt(2^lg_k) ≈ 1.6% at the default lg_k=12."""
    return F.hll_sketch_agg(col, F.lit(lg_k))


def distinct_sketch_rollup(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Per-key HLL sketches + estimates.  The ``sketch`` column is the
    mergeable artifact to persist; ``estimate`` is its current reading."""
    out = df.groupBy(*keys).agg(hll_sketch(value_col, lg_k).alias("sketch"))
    return out.withColumn("estimate", F.hll_sketch_estimate("sketch"))


def merge_sketch_rollups(
    sketches: DataFrame,
    keys: Sequence[str],
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate persisted sketches to a coarser key set (e.g. daily →
    monthly) WITHOUT rescanning raw data — the whole point of sketches."""
    out = sketches.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias("sketch")
    )
    return out.withColumn("estimate", F.hll_sketch_estimate("sketch"))


def approx_quantiles(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    probabilities: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key approximate quantiles (Greenwald-Khanna summary —
    partial-aggregated, single shuffle on the keys)."""
    return df.groupBy(*keys).agg(
        F.percentile_approx(
            value_col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
        ).alias("quantiles")
    )
