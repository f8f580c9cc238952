"""Multi-file / directory / partitioned Parquet sources.

The reference addresses exactly one file per query and scales out by
running one process per file, shipping results over Arrow IPC
(reference: parquery/aggregate.py:72-83, README.md:4,159).  On Spark the
same corpus is ONE dataset: the scheduler assigns file splits to tasks, and
the "hundreds of files × billions of rows" deployment becomes a single
query — this module is that upgrade path.

* ``read_parquet_files``: explicit file list (the reference's unit), with
  ``mergeSchema`` for footer drift between files.
* ``read_parquet_dataset``: directory / glob / hive-partitioned layout;
  partition columns become virtual columns and partition pruning applies
  to filters on them (check ``.explain`` → ``PartitionFilters``).
* ``write_partitioned``: hive-layout writer (``partitionBy``), the sink
  that makes partition pruning possible downstream.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def read_parquet_files(
    spark: SparkSession,
    paths: Sequence[str],
    merge_schema: bool = True,
) -> DataFrame:
    """Read an explicit list of parquet files as one DataFrame.

    With ``merge_schema`` the union schema is reconciled across footers —
    files missing a column yield nulls for it, the multi-file analogue of
    the single-file tolerant-schema contract (SURVEY.md §1)."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def read_parquet_dataset(
    spark: SparkSession,
    path: str,
    merge_schema: bool = False,
) -> DataFrame:
    """Read a directory / glob / hive-partitioned parquet dataset."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    mode: str = "overwrite",
    compression: str = "zstd",
) -> str:
    """Write a hive-partitioned parquet dataset (one directory level per
    partition column; downstream filters on those columns prune I/O)."""
    (
        df.write.mode(mode)
        .partitionBy(*partition_by)
        .parquet(path, compression=compression)
    )
    return path


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 << 20,
    partition_by: Sequence[str] | None = None,
    compression: str = "zstd",
) -> int:
    """Rewrite a parquet dataset into ~``target_file_bytes`` files — the
    small-file compaction every long-lived ingest pipeline needs (streaming
    sinks and per-batch writers emit thousands of KB-scale files; scans
    then pay per-file open/footer costs and lose row-group locality).

    Sizing is driver-side from the existing footers (no data pass), then a
    single distributed rewrite: round-robin ``repartition(n)`` for a flat
    layout, or per-partition-directory file counts via ``partitionBy``.
    Returns the file count written.  The rewrite lands in ``path + ".tmp"``
    then atomically replaces ``path`` (rename) — readers mid-scan keep
    their snapshot via already-open handles; new readers see old or new,
    never a mix of halves.
    """
    import glob as _glob
    import os as _os
    import shutil as _shutil

    files = [
        f for f in _glob.glob(_os.path.join(path, "**", "*.parquet"),
                              recursive=True)
    ]
    total = sum(_os.path.getsize(f) for f in files) or 1
    n = max(1, round(total / target_file_bytes))

    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".tmp"
    writer = df.repartition(n).write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp, compression=compression)

    out_files = len(
        _glob.glob(_os.path.join(tmp, "**", "*.parquet"), recursive=True)
    )
    old = path.rstrip("/") + ".old"
    _os.rename(path, old)
    _os.rename(tmp, path)
    _shutil.rmtree(old)
    return out_files
