"""Join operators — the capability extension the single-table reference
lacks (SURVEY.md §2.4: "cross-file combination happens in the calling
service"; here it's first-class and distributed).

Scale guidance encoded in the API:

* ``join_tables`` broadcasts the small side explicitly when asked, otherwise
  trusts Catalyst/AQE (size-based broadcast, skew-join splitting).
* ``asof_join`` is implemented as union + partitioned window scan — one
  shuffle on the key, no range cross-product, the standard distributed
  as-of strategy (no Pandas UDF needed).
* ``range_join`` buckets both sides on coarse range keys so the theta-join
  degenerates to an equi-join on bucket + residual predicate.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def join_tables(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
    broadcast_right: bool = False,
) -> DataFrame:
    """Equi/semi/anti join wrapper with an explicit broadcast escape hatch
    for dimension tables Catalyst's statistics can't size."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    return left.join(right, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    direction: str = "backward",
    right_on: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` (direction='backward') or the next one
    (direction='forward'), per key.

    Distributed strategy: tag and union both sides, then one window scan
    per key ordered by time — ``last(value, ignorenulls=True)`` carries the
    prevailing right-side values onto left rows.  One shuffle on ``on``;
    no per-key loops, no cross product; skew on hot keys is AQE-handled.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    right_key = right_on or on

    lcols = [c for c in left.columns]
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_cols],
    )
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l.schema["__l"].dataType
        ).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    unioned = l.unionByName(r)

    if direction == "backward":
        # right rows sort before left rows at equal ts, so an exact-ts match
        # is visible to the left row
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in right_cols
        ]
    else:
        w = (
            Window.partitionBy("__k")
            .orderBy(F.col("__ts").desc(), F.col("__is_left").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = [
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__v_{c}")
            for c in right_cols
        ]

    out = unioned.select("*", *carried).filter(F.col("__is_left") == 1)
    return out.select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        *[F.col(f"__v_{c}").alias(c) for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    extra_on: Sequence[str] = (),
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Point-in-interval join, bucketized: explode each right interval to
    the coarse buckets it spans, equi-join on bucket (+ optional keys),
    then apply the exact range predicate.  Turns an O(n·m) theta join into
    a shuffle join whose fan-out is interval_width / bucket_width."""
    lb = left.withColumn(
        "__bucket", F.floor(F.col(left_point) / F.lit(bucket_width)).cast("long")
    )
    rb = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / F.lit(bucket_width)).cast("long"),
                F.floor(F.col(right_hi) / F.lit(bucket_width)).cast("long"),
            )
        ),
    )
    on = ["__bucket", *extra_on]
    # interval tables are usually tiny next to the point side; without the
    # hint Catalyst may broadcast the (locally small) fact side instead —
    # backwards at scale
    if broadcast_intervals:
        rb = F.broadcast(rb)
    return (
        lb.join(rb, on)
        .filter(
            (F.col(left_point) >= F.col(right_lo))
            & (F.col(left_point) <= F.col(right_hi))
        )
        .drop("__bucket")
    )
