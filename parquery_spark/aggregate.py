"""Public query API: ``aggregate_pq`` — filter + group-by aggregation over a
Parquet file, with the reference's tolerant-schema semantics.

API parity target: ``parquery.aggregate.aggregate_pq``
(reference: parquery/aggregate.py:72-221).  Differences, all documented:

* ``engine`` accepts ``"spark"`` / ``"auto"`` (both mean Spark); the
  reference's ``"duckdb"`` / ``"pyarrow"`` values are accepted and ignored —
  there is one engine here.
* String filter values work (the reference's DuckDB engine generated invalid
  SQL for them, SURVEY.md §4).
* ``count_na`` counts nulls per the documented semantics (broken in both
  reference engines, SURVEY.md §2.3 A5).
* ``std`` is sample stddev (ddof=1) — the reference's two engines disagreed;
  we match its default (DuckDB) engine.

Scale note: ``aggregate_pq`` materializes to Arrow/pandas on the driver for
API parity — correct for the reference's aggregated-result sizes (dimension
cardinality, not input rows).  For 100 TB pipelines where even the *result*
is large, use :func:`aggregate_plan` and keep the DataFrame lazy (write it,
join it, feed it onward) — no driver materialization.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

from parquery_spark.plans.aggregation import build_aggregation_plan
from parquery_spark.session import get_small_query_session, get_spark


def aggregate_plan(
    file_name: str | Sequence[str],
    groupby_cols: Sequence[str],
    measure_cols: Sequence[Any],
    data_filter: Sequence[Sequence[Any]] | None = None,
    aggregate: bool = True,
    standard_missing_id: int = -1,
    handle_missing_file: bool = True,
    spark: SparkSession | None = None,
    use_relation_cache: bool = True,
) -> DataFrame:
    """Lazy-DataFrame variant of :func:`aggregate_pq` — the scale path.

    ``use_relation_cache=False`` forces the streaming parquet scan (full
    predicate pushdown, nothing persisted) even for small inputs — the plan
    shape a 100 TB table always gets.
    """
    spark = spark or get_spark()
    return build_aggregation_plan(
        spark,
        file_name,
        groupby_cols,
        measure_cols,
        data_filter=data_filter,
        aggregate=aggregate,
        standard_missing_id=standard_missing_id,
        handle_missing_file=handle_missing_file,
        use_relation_cache=use_relation_cache,
    )


def aggregate_pq(
    file_name: str | Sequence[str],
    groupby_cols: Sequence[str],
    measure_cols: Sequence[Any],
    data_filter: Sequence[Sequence[Any]] | None = None,
    aggregate: bool = True,
    as_df: bool = False,
    standard_missing_id: int = -1,
    handle_missing_file: bool = True,
    debug: bool = False,
    engine: str = "auto",
):
    """Aggregate a Parquet file: filter rows, group by dimensions, aggregate
    measures.  Returns ``pyarrow.Table`` (default) or pandas DataFrame.

    Args:
        file_name: path to one Parquet file (the reference's unit of
            distribution is one file per query; reference:
            parquery/aggregate.py:72-83) — or a LIST of paths, which the
            reference handled as one process per file + caller-side
            recombination and is here a single distributed query
            (mergeSchema reconciles footer drift between files).
        groupby_cols: dimension column names.
        measure_cols: ``['m']`` | ``[['m','op']]`` | ``[['m','op','out']]``;
            default op is ``sum``.  Ops: sum, mean/avg, std/stddev, count,
            count_na, count_distinct, sorted_count_distinct, min, max, one.
        data_filter: ``[[col, op, value(s)], ...]``, ANDed; ops:
            in, not in, nin, =, ==, !=, >, >=, <, <=.
        aggregate: False → filtered raw rows, no grouping.
        as_df: True → pandas DataFrame.
        standard_missing_id: fill for dimension columns absent from the file.
        handle_missing_file: False → raise OSError on missing file.
        debug: accepted for API parity.
        engine: accepted for API parity; always Spark.
    """
    if engine not in ("auto", "spark", "duckdb", "pyarrow"):
        raise ValueError(
            f"Unknown engine: {engine}. Must be 'auto', 'spark', 'duckdb', or 'pyarrow'"
        )
    spark = get_spark()
    if _is_small_input(file_name):
        # Execute under the dedicated small-query session (AQE off, single
        # reduce partition, interpreted codegen) instead of mutating the
        # shared session's conf — thread-safe by construction: a concurrent
        # large query on the parent session keeps AQE/codegen untouched.
        spark = get_small_query_session(spark)
    df = build_aggregation_plan(
        spark,
        file_name,
        groupby_cols,
        measure_cols,
        data_filter=data_filter,
        aggregate=aggregate,
        standard_missing_id=standard_missing_id,
        handle_missing_file=handle_missing_file,
    )
    if as_df:
        return df.toPandas()
    return _to_arrow(df)


#: below this total input size, per-query latency is dominated by fixed
#: scheduling costs — AQE's extra stage re-planning and a wide shuffle buy
#: nothing (measured ~25% latency saving at 600k rows, local mode)
SMALL_INPUT_BYTES = 256 << 20


def _is_small_input(file_name) -> bool:
    paths = [file_name] if isinstance(file_name, str) else list(file_name)
    try:
        total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    except OSError:
        return False
    return total < SMALL_INPUT_BYTES


def _to_arrow(df: DataFrame) -> pa.Table:
    """Materialize a Spark DataFrame as a pyarrow Table (Arrow-native path)."""
    try:
        return df.toArrow()
    except Exception:
        # NullType empty results can trip Arrow conversion on some versions;
        # synthesize the null-typed table directly (reference contract:
        # parquery/tool.py:222-237).
        if df.isEmpty():
            schema = pa.schema([(c, pa.null()) for c in df.columns])
            return pa.Table.from_pydict({c: [] for c in df.columns}, schema=schema)
        raise
