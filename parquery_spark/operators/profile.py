"""Single-pass column profiler — the engine's ``ANALYZE TABLE`` /
data-quality surface: per-column row count, null count, distinct count, and
min/max, computed in ONE scan regardless of column count.

Plan shape: one aggregation producing an array of per-column stat structs,
then ``inline`` to rows.  All per-column stats are partial-aggregated
map-side; the only wide part is distinct counting, which Spark plans as one
Expand (k+1 projections for k distinct-counted columns) over the scan —
still a single pass of the input.  For 100 TB profiling runs set
``exact_distinct=False``: HyperLogLog sketches (``approx_count_distinct``)
drop the Expand entirely and shuffle k fixed-size sketch buffers per task.

Numeric min/max surface as DOUBLE (``min_num``/``max_num``); everything
else (strings, dates, booleans) surfaces as its canonical string form
(``min_str``/``max_str``) — two typed column pairs instead of one
stringified pair, because float→string formatting is engine-specific while
DOUBLE values and ISO date strings are exact.

The reference has no profiling operator (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "tinyint", "smallint", "int", "bigint", "float", "double", "decimal",
)


def column_profile(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one scan.

    Output rows: ``(column, n_rows, n_null, n_distinct, min_num, max_num,
    min_str, max_str)`` — one per profiled column, in the requested order.
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    distinct = F.count_distinct if exact_distinct else F.approx_count_distinct

    entries = []
    for name in cols:
        dt = dtypes[name]
        numeric = dt.startswith(_NUMERIC_PREFIXES)
        c = F.col(name)
        entries.append(
            F.struct(
                F.lit(name).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(c.isNull().cast("long")).alias("n_null"),
                distinct(c).alias("n_distinct"),
                (F.min(c).cast("double") if numeric
                 else F.lit(None).cast("double")).alias("min_num"),
                (F.max(c).cast("double") if numeric
                 else F.lit(None).cast("double")).alias("max_num"),
                (F.lit(None).cast("string") if numeric
                 else F.min(c).cast("string")).alias("min_str"),
                (F.lit(None).cast("string") if numeric
                 else F.max(c).cast("string")).alias("max_str"),
            )
        )
    return df.agg(F.array(*entries).alias("__prof")).select(
        F.inline("__prof")
    )
