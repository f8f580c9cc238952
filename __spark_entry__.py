"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()`` — every implemented operator, one lazy-DataFrame callable each.
``oracle_sql()`` — DuckDB-equivalent SQL per query (correctness gate).

The real registry lives in ``parquery_spark.queries``; this module is a thin
adapter so the package stays importable on its own.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from parquery_spark.queries import QUERIES

    return QUERIES["q01_pricing_summary"][0](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # reordered_queries puts a representative-per-family 50 first so the
    # driver's first-50 CORRECTNESS snapshot spans the whole operator surface
    from parquery_spark.queries import reordered_queries

    return {name: fn for name, (fn, _sql) in reordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    from parquery_spark.queries import reordered_queries

    return {
        name: sql
        for name, (_fn, sql) in reordered_queries().items()
        if sql is not None
    }
