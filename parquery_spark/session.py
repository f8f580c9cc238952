"""SparkSession bootstrap for parquery_spark.

The reference (parquery) opens a fresh DuckDB ``:memory:`` connection per
query (reference: parquery/aggregate_duckdb.py:216-270) and tunes it from
environment variables.  On Spark the analogous lifecycle object is a single
long-lived ``SparkSession``; per-query connections would pay JVM startup for
every call.  We keep a module-level singleton, tuned for the scale the engine
targets:

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting.
  At 100 TB the static ``spark.sql.shuffle.partitions`` can never be right
  for every stage; AQE re-plans from runtime statistics.
* Arrow-based transfers on — the reference's result handoff is Arrow IPC
  (reference: parquery/transport.py:12-75); ``df.toArrow()`` keeps that
  boundary zero-copy-ish.
* Shuffle partitions default to the local core count for test scale; on a
  real cluster this is overridden via ``PARQUERY_SPARK_CONF_*`` env vars or
  ``configure()``.

Environment overrides (mirroring the reference's ``DUCKDB_MEMORY_LIMIT`` /
``DUCKDB_THREADS`` pattern, reference: parquery/aggregate_duckdb.py:40-58):

* ``PARQUERY_SPARK_MASTER``   — default ``local[*]``
* ``PARQUERY_SPARK_MEMORY``   — driver memory in local mode
* ``PARQUERY_SPARK_SHUFFLE_PARTITIONS``
* ``PARQUERY_SPARK_CONF_<key with __ for .>=<value>`` — arbitrary conf
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Session-wide contract: parquet TIMESTAMP(NANOS) columns read as raw
    # nanosecond longs instead of erroring (Spark has no nanos timestamp
    # type).  Documented in queries.load_events, which shows the ns→µs
    # truncation recipe.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "parquery_spark") -> SparkSession:
    """Return the process-wide SparkSession, creating it on first use."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    master = os.environ.get("PARQUERY_SPARK_MASTER", "local[*]")
    builder = SparkSession.builder.master(master).appName(app_name)

    conf = dict(_DEFAULTS)
    cpus = os.cpu_count() or 8
    conf["spark.sql.shuffle.partitions"] = os.environ.get(
        "PARQUERY_SPARK_SHUFFLE_PARTITIONS", str(min(cpus, 32))
    )
    mem = os.environ.get("PARQUERY_SPARK_MEMORY")
    if mem:
        conf["spark.driver.memory"] = mem
    for key, value in os.environ.items():
        if key.startswith("PARQUERY_SPARK_CONF_"):
            conf[key[len("PARQUERY_SPARK_CONF_"):].replace("__", ".")] = value

    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
