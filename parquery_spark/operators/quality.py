"""Declarative data-quality constraint suite (Deequ-style), compiled to
ONE aggregate pass over the table plus one anti-join per referential
check.

Every non-relational constraint (completeness, uniqueness, bounds,
accepted values, row count) becomes a column expression inside a single
global aggregate — the whole suite costs one scan regardless of how many
checks it holds, which is what makes running it on every 100 TB ingest
batch affordable.  Referential-integrity checks each add one LeftAnti
join against the (broadcast) parent key set.

The result is long-form: one row per check with its measured metric and
pass/fail — the shape monitoring systems ingest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Check:
    def __init__(self, name: str, metric: Column, passed: Column):
        self.name = name
        self.metric = metric
        self.passed = passed


def not_null(col: str, min_ratio: float = 1.0) -> Check:
    ratio = F.count(col) / F.count(F.lit(1))
    return Check(f"not_null({col})", ratio, ratio >= min_ratio)


def unique(col: str) -> Check:
    ratio = F.countDistinct(col) / F.count(col)
    return Check(f"unique({col})", ratio, ratio >= 1.0)


def bounds(col: str, lo: float, hi: float) -> Check:
    viol = F.sum(
        F.when(~F.col(col).between(lo, hi), 1).otherwise(0)
    ).cast("double")
    return Check(f"bounds({col})", viol, viol == 0)


def accepted_values(col: str, values: list) -> Check:
    viol = F.sum(
        F.when(~F.col(col).isin(values) | F.col(col).isNull(), 1).otherwise(0)
    ).cast("double")
    return Check(f"accepted_values({col})", viol, viol == 0)


def row_count_at_least(n: int) -> Check:
    cnt = F.count(F.lit(1)).cast("double")
    return Check("row_count", cnt, cnt >= n)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """All checks in one aggregate; unpivot to (check, metric, passed).

    The unpivot Expand runs AFTER the aggregation (q88 rule): it
    multiplies one row, not the table.
    """
    agg = df.agg(
        *[
            e
            for i, c in enumerate(checks)
            for e in (
                F.round(c.metric, 6).alias(f"m{i}"),
                c.passed.alias(f"p{i}"),
            )
        ]
    )
    stack = ", ".join(
        f"'{c.name}', m{i}, p{i}" for i, c in enumerate(checks)
    )
    return agg.select(
        F.expr(
            f"stack({len(checks)}, {stack}) AS (check, metric, passed)"
        )
    )


def referential_check(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Orphan count as a (check, metric, passed) row: LeftAnti against
    the parent key set (broadcast when small — dimension tables are)."""
    orphans = child.join(
        F.broadcast(parent.select(parent_key).distinct()),
        child[child_key] == F.col(parent_key),
        "left_anti",
    ).agg(F.count(F.lit(1)).cast("double").alias("metric"))
    return orphans.select(
        F.lit(f"referential({child_key})").alias("check"),
        F.round("metric", 6).alias("metric"),
        (F.col("metric") == 0).alias("passed"),
    )
