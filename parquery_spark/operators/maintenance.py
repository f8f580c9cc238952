"""Table-maintenance operators: small-file compaction.

The small-files problem is a first-class failure mode at 100 TB: a
partitioned layout written by many tasks accumulates files far below the
HDFS/S3-efficient size, and every downstream scan pays per-file open +
footer-parse + scheduler overhead.  Compaction rewrites a directory to
~target-sized files without changing its contents.

Reference parity note: the reference engine (parquery) writes single
files per call (reference/parquery/write.py) and has no maintenance
surface; this is scale-path extension, validated by checksum equality in
the oracled query q120.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def dir_parquet_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of the parquet data files under ``path``."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_files(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite ``src_dir``'s parquet files into ~``target_bytes`` files.

    Uses ``coalesce`` — a NARROW repartitioning that concatenates input
    splits into fewer tasks without a shuffle, which is the right call for
    compaction: the data is already in its final form, only the file
    boundaries change.  (``repartition`` would shuffle every byte; at
    compaction scale that doubles the I/O bill.)  Caveat: coalesce gives
    up intra-job parallelism below the target file count and can carry
    input skew into output file sizes; a 100 TB deployment runs one
    compaction job PER partition directory so each job stays small and
    partition pruning is preserved.

    Returns {files_before, files_after, bytes} (from the source listing —
    the decision inputs, so callers can log the plan deterministically).
    """
    n_before, total = dir_parquet_stats(src_dir)
    n_out = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_dir)
    df.coalesce(n_out).write.mode("overwrite").parquet(dst_dir)
    n_after, _ = dir_parquet_stats(dst_dir)
    return {
        "files_before": n_before,
        "files_after": n_after,
        "bytes": total,
    }
