"""Skew-mitigation operators: salted two-stage aggregation and salted
broadcast joins — for the hot-key distributions AQE alone can't always
save (a single key holding 30% of 100 TB overwhelms one reducer no matter
how the remaining partitions are split).

These complement, not replace, AQE (``spark.sql.adaptive.skewJoin`` is on
in the session defaults): salting is the explicit tool for *known* skew —
e.g. the null/default dimension value (the reference's ``-1`` "unknown"
sentinel is exactly such a hot key, SURVEY.md §1).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquery_spark.plans.aggregation import agg_expr

#: ops that decompose as op(op(partials)) — safe for two-stage salting
_RESALT_FINAL = {
    "sum": "sum",
    "min": "min",
    "max": "max",
    "count": "sum",
    "count_na": "sum",
}


def salted_groupby(
    df: DataFrame,
    groupby_cols: Sequence[str],
    measure_cols: Sequence[Sequence[str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation: stage 1 aggregates on
    (dims + random salt) — splitting every hot key across ``salt_buckets``
    reducers — stage 2 re-aggregates the partials on the true dims.

    Only decomposable ops are accepted (sum/min/max/count/count_na; count
    re-aggregates as sum — the same restriction as the reference's
    SAFE_PREAGGREGATE set, reference: parquery/tool.py:37, and for the same
    reason: a mean of partial means is wrong).  Results are identical to a
    direct ``groupBy`` — only the shuffle distribution changes.
    """
    for _, op, _ in measure_cols:
        if op.lower() not in _RESALT_FINAL:
            raise NotImplementedError(
                f"salted_groupby supports decomposable ops {sorted(_RESALT_FINAL)}; "
                f"got {op!r} (non-decomposable ops don't re-aggregate correctly)"
            )
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*groupby_cols, "__salt").agg(
        *[agg_expr(col, op, out) for col, op, out in measure_cols]
    )
    finals = [
        agg_expr(out, _RESALT_FINAL[op.lower()], out)
        for _, op, out in measure_cols
    ]
    return partial.groupBy(*groupby_cols).agg(*finals)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str | None = None,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side randomly and
    explode the (smaller) right side across all salt values, so one hot key
    spreads over ``salt_buckets`` reducers.  Right-side rows are replicated
    ``salt_buckets``× — use only when right ≪ left."""
    rk = right_on or on
    l = left.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    cond = (l[on] == r[rk]) & (l["__salt"] == r["__salt"])
    return l.join(r, cond, how).drop("__salt")
