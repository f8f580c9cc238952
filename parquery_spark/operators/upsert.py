"""Snapshot upsert (CDC merge) and time-series gap-filling — the
incremental-maintenance surface a long-lived analytics corpus needs.

Parquet is immutable, so "merge" at scale is snapshot semantics: the next
table version = current rows whose key is untouched + every batch row.
That is exactly one **anti join** (shuffle on the key, or broadcast when
the batch is small — Catalyst picks) plus a union; no per-row point
updates, no driver-side diffing.  Table-format engines (Delta/Iceberg)
implement the same plan under ``MERGE INTO``; here it is explicit and
composable with the engine's own writer/compaction.

The reference is read-only over existing parquet (SURVEY.md §2 — its
writer is a plain overwrite sink); upsert/gap-fill are beyond-reference
pipeline capabilities.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def upsert(
    current: DataFrame,
    batch: DataFrame,
    keys: Sequence[str],
) -> DataFrame:
    """Next snapshot: ``batch`` rows win on key collision, untouched
    ``current`` rows carry over, new keys append.

    One anti join + one union — the batch key set is typically ≪ the
    snapshot, so the anti join broadcasts the batch's keys; a same-scale
    batch degrades gracefully to a shuffle join on the keys.  If ``batch``
    carries duplicate keys, resolve them BEFORE calling (e.g. keep the
    latest by version column) — this operator is deliberately one-row-per-
    key agnostic."""
    untouched = current.join(
        batch.select(*keys).distinct(), list(keys), "left_anti"
    )
    return untouched.unionByName(batch)


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str | Column,
) -> DataFrame:
    """Collapse a changelog to one row per key — the highest ``order_col``
    (version, event time) wins, ties broken deterministically by the full
    row's arrival being irrelevant: use a strictly monotone version.
    Plans as one shuffle on the keys + per-key max_by (partial-aggregated
    map-side) — NOT a row_number window (a window sorts every group;
    max_by keeps one row of state per key)."""
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    cols = [c for c in df.columns]
    return (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*cols), oc).alias("__r"))
        .select("__r.*")
    )


def fill_gaps(
    df: DataFrame,
    key_col: str,
    bucket_col: str,
    step: int,
    agg_cols: Sequence[str],
    locf_cols: Sequence[str] = (),
) -> DataFrame:
    """Densify a per-(key, integer bucket) time series: emit every bucket
    from each key's min to max in ``step`` increments, zero-filling
    ``agg_cols`` and carrying the last observation forward for
    ``locf_cols``.

    The bucket spine is ``sequence()`` exploded from ONE row per key (the
    min/max aggregate) — never a driver-side range nor a cross join with a
    calendar table.  LOCF is ``last(ignore_nulls)`` over a window
    partitioned BY KEY (bounded partitions — a key's buckets, not the
    corpus)."""
    spine = (
        df.groupBy(key_col)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            key_col,
            F.explode(
                F.sequence("__lo", "__hi", F.lit(step))
            ).alias(bucket_col),
        )
    )
    dense = spine.join(df, [key_col, bucket_col], "left")
    out = dense.select(
        key_col,
        bucket_col,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in agg_cols],
        *[F.col(c) for c in locf_cols],
    )
    if locf_cols:
        w = (
            Window.partitionBy(key_col)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            key_col,
            bucket_col,
            *agg_cols,
            *[
                F.last(c, ignorenulls=True).over(w).alias(c)
                for c in locf_cols
            ],
        )
    return out
