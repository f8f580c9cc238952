"""Query registry: every implemented operator exposed as a named query with
a DuckDB oracle-SQL twin (the driver's correctness gate).

Each entry maps ``name -> (spark_fn, oracle_sql_or_None)`` where ``spark_fn``
takes ``(spark, sf_dir)`` and returns a lazy DataFrame.  Column names are
aliased identically in the Spark plan and the SQL so the driver's
sorted-by-name value-hash comparison lines up.

Float discipline: aggregates over non-integral doubles are rounded the same
number of digits on both sides (Spark ``F.round`` / SQL ``ROUND``) so that
partial-aggregation order differences between engines can't flip a hash bit.
Sums of whole-number-valued doubles (e.g. ``l_quantity``) are exact in IEEE
double and need no rounding.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquery_spark.plans.aggregation import build_aggregation_plan

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = (fn, sql)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _path(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# ===========================================================================
# Core parity surface (SURVEY.md §2.2-2.3) — via the aggregate_pq plan builder
# ===========================================================================

@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity)                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)     AS sum_base_price,
           ROUND(AVG(l_quantity), 6)          AS avg_qty,
           COUNT(l_orderkey)                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — the reference API's flagship expressible query
    (dims + sums + mean + count with a date-range filter)."""
    df = build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [
            ["l_quantity", "sum", "sum_qty"],
            ["l_extendedprice", "sum", "sum_base_price"],
            ["l_quantity", "mean", "avg_qty"],
            ["l_orderkey", "count", "count_order"],
        ],
        data_filter=[["l_shipdate", "<=", "1998-09-01"]],
    )
    return df.select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        F.round("sum_base_price", 2).alias("sum_base_price"),
        F.round("avg_qty", 6).alias("avg_qty"),
        "count_order",
    )


@query(
    "q02_global_agg",
    """
    SELECT SUM(l_quantity)                AS total_qty,
           ROUND(AVG(l_discount), 6)      AS avg_disc,
           MIN(l_quantity)                AS min_qty,
           MAX(l_quantity)                AS max_qty,
           COUNT(l_orderkey)              AS n
    FROM lineitem
    """,
)
def q02_global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregation, empty groupby (SURVEY §2.3 A11)."""
    df = build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        [],
        [
            ["l_quantity", "sum", "total_qty"],
            ["l_discount", "mean", "avg_disc"],
            ["l_quantity", "min", "min_qty"],
            ["l_quantity", "max", "max_qty"],
            ["l_orderkey", "count", "n"],
        ],
    )
    return df.withColumn("avg_disc", F.round("avg_disc", 6))


@query(
    "q03_filter_in_string",
    """
    SELECT l_linestatus, SUM(l_quantity) AS sum_qty
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R')
    GROUP BY l_linestatus
    """,
)
def q03_filter_in_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-valued IN filter — broken on the reference's default engine
    (SURVEY §4 caveat); first-class here."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        ["l_linestatus"],
        [["l_quantity", "sum", "sum_qty"]],
        data_filter=[["l_returnflag", "in", ["A", "R"]]],
    )


@query(
    "q04_filter_range_and",
    """
    SELECT l_returnflag, COUNT(l_orderkey) AS n, SUM(l_quantity) AS sum_qty
    FROM lineitem
    WHERE l_quantity > 10 AND l_quantity <= 40
      AND l_discount >= 0.02 AND l_discount < 0.08
    GROUP BY l_returnflag
    """,
)
def q04_filter_range_and(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-folded range predicates (P2, P7)."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        ["l_returnflag"],
        [["l_orderkey", "count", "n"], ["l_quantity", "sum", "sum_qty"]],
        data_filter=[
            ["l_quantity", ">", 10],
            ["l_quantity", "<=", 40],
            ["l_discount", ">=", 0.02],
            ["l_discount", "<", 0.08],
        ],
    )


@query(
    "q05_filter_neq_notin",
    """
    SELECT o_orderpriority, COUNT(o_orderkey) AS n,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM orders
    WHERE o_orderstatus != 'F' AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def q05_filter_neq_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """!= and NOT IN filters (P4, P6)."""
    df = build_aggregation_plan(
        spark,
        _path(sf_dir, "orders"),
        ["o_orderpriority"],
        [["o_orderkey", "count", "n"], ["o_totalprice", "sum", "total"]],
        data_filter=[
            ["o_orderstatus", "!=", "F"],
            ["o_orderpriority", "not in", ["1-URGENT", "2-HIGH"]],
        ],
    )
    return df.withColumn("total", F.round("total", 2))


@query(
    "q06_count_family",
    """
    SELECT o_orderstatus,
           COUNT(o_custkey)                               AS n,
           COUNT(DISTINCT o_custkey)                      AS n_distinct,
           COUNT(CASE WHEN o_custkey IS NULL THEN 1 END)  AS n_null
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q06_count_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count / count_distinct / count_na (A4-A7; count_na fixed to README
    semantics — broken in both reference engines)."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "orders"),
        ["o_orderstatus"],
        [
            ["o_custkey", "count", "n"],
            ["o_custkey", "count_distinct", "n_distinct"],
            ["o_custkey", "count_na", "n_null"],
        ],
    )


@query(
    "q07_one_min_max_stddev",
    """
    SELECT p_brand,
           MIN(p_type)                       AS one_type,
           MIN(p_retailprice)                AS min_price,
           MAX(p_retailprice)                AS max_price,
           ROUND(STDDEV_SAMP(p_retailprice), 6) AS sd_price
    FROM part
    GROUP BY p_brand
    """,
)
def q07_one_min_max_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """one (deterministic MIN, A10), min/max (A8-A9), sample stddev (A3)."""
    df = build_aggregation_plan(
        spark,
        _path(sf_dir, "part"),
        ["p_brand"],
        [
            ["p_type", "one", "one_type"],
            ["p_retailprice", "min", "min_price"],
            ["p_retailprice", "max", "max_price"],
            ["p_retailprice", "std", "sd_price"],
        ],
    )
    return df.withColumn("sd_price", F.round("sd_price", 6))


@query(
    "q08_passthrough",
    """
    SELECT c_acctbal, c_custkey, c_mktsegment, c_nationkey
    FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'MACHINERY') AND c_acctbal > 0
    """,
)
def q08_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggregate=False raw-row mode (A12): filter + sorted distinct projection."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "customer"),
        ["c_custkey", "c_mktsegment"],
        [["c_acctbal"], ["c_nationkey"]],
        data_filter=[
            ["c_mktsegment", "in", ["BUILDING", "MACHINERY"]],
            ["c_acctbal", ">", 0],
        ],
        aggregate=False,
    )


@query(
    "q09_missing_column_splice",
    """
    SELECT l_returnflag, SUM(l_quantity) AS sum_qty,
           CAST(0.0 AS DOUBLE) AS ghost_measure, -1 AS ghost_dim
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q09_missing_column_splice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerant-schema splice: absent dim → -1, absent measure → 0.0
    (U3; reference: parquery/tool.py:240-301)."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        ["l_returnflag", "ghost_dim"],
        [["l_quantity", "sum", "sum_qty"], ["ghost_col", "sum", "ghost_measure"]],
    )


@query(
    "q10_groupby_only_distinct",
    """
    SELECT l_returnflag, l_linestatus FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q10_groupby_only_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-by with no surviving measures → distinct dimension rows."""
    return build_aggregation_plan(
        spark,
        _path(sf_dir, "lineitem"),
        ["l_returnflag", "l_linestatus"],
        [],
    )
