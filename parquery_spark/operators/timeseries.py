"""Time-series reconstruction operators: calendar resampling (gap fill)
and forward fill.

The reference library (parquery v2.2.1, ``aggregate.py`` /
``aggregate_duckdb.py``) has no time-series surface at all — groupby
output simply omits empty buckets.  A training-data/feature pipeline
needs the dense form: one row per (key, period) over each key's active
span, with absent periods zero-filled (counts) or carried forward
(state-like metrics).  This module produces it with two shuffles total:

1. the grain aggregation (one exchange on (key, day)),
2. the per-key span + calendar explode + gap-fill window (one exchange
   on key).

Scale: output rows = keys x days-in-span, never a cross product of the
input; the calendar is generated per key with ``sequence()`` (no driver
loop, no cross join).  The forward-fill window is partitioned by key and
ordered by day — span length per key is bounded by the calendar (days,
not data volume), so no single-task window appears even when one key
holds billions of raw events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def resample_daily(
    df: DataFrame,
    keys: list[str],
    day_col: str | Column,
    aggs: dict[str, Column],
    zero_fill: list[str] | None = None,
    ffill: list[str] | None = None,
) -> DataFrame:
    """Aggregate ``df`` to (keys, day) grain, then densify each key's
    span to one row per calendar day.

    ``aggs``
        output-name -> aggregate Column, evaluated at the (keys, day)
        grain (e.g. ``{"n": F.count("*")}``).
    ``zero_fill``
        agg output names whose gap-day value is 0.
    ``ffill``
        agg output names carried forward from the most recent present
        day (classic forward fill; the first day of a span always has
        data, so no leading NULL survives).

    Returns columns ``keys + ["day"] + list(aggs)`` where each
    ``ffill`` column ``c`` is emitted as the filled series (same name).
    """
    zero_fill = zero_fill or []
    ffill = ffill or []
    day = F.col(day_col) if isinstance(day_col, str) else day_col
    day = day.cast("date")

    daily = (
        df.groupBy(*keys, day.alias("day"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )

    # Per-key span -> calendar frame.  sequence() builds the day array
    # JVM-side; explode fans it out — rows = span length, generated at
    # the executors that own the key.
    cal = (
        daily.groupBy(*keys)
        .agg(F.min("day").alias("__d0"), F.max("day").alias("__d1"))
        .select(
            *keys,
            F.explode(
                F.sequence("__d0", "__d1", F.expr("interval 1 day"))
            ).alias("day"),
        )
    )

    dense = cal.join(daily, on=[*keys, "day"], how="left")
    for name in zero_fill:
        dense = dense.withColumn(name, F.coalesce(F.col(name), F.lit(0)))
    if ffill:
        w = (
            Window.partitionBy(*keys)
            .orderBy("day")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for name in ffill:
            dense = dense.withColumn(
                name, F.last(F.col(name), ignorenulls=True).over(w)
            )
    return dense
