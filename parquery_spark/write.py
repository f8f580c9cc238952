"""Parquet ingest: ``df_to_parquet`` — API parity with the reference writer
(reference: parquery/write.py:57-138).

Accepts pandas, pyarrow, Polars (if installed), and Spark DataFrames; always
writes ZSTD-compressed Parquet; overwrites an existing target
(reference: parquery/write.py:33-54).

Scale notes:

* A **Spark DataFrame** input writes distributedly via
  ``df.write.parquet(..., compression='zstd')`` — each task writes its own
  part file; no driver bottleneck.  When ``single_file=True`` (the
  reference's contract is one file per table) the plan is coalesced to one
  output task — only appropriate for result-sized data.
* Driver-local inputs (pandas/arrow/polars) write via pyarrow directly —
  shipping driver-local data through the JVM and back would add two
  serialization hops for nothing.
* ``chunksize`` is accepted for API parity (reference pandas path writes in
  100k-row slices to bound memory, parquery/write.py:141-204); the pyarrow
  writer here slices equivalently.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

try:  # optional, as in the reference
    import polars as pl
except ImportError:  # pragma: no cover
    pl = None

try:
    import pandas as pd
except ImportError:  # pragma: no cover
    pd = None


def create_full_filename(filename: str, workdir: str | None = None) -> str:
    """Resolve the output path; remove a pre-existing target (overwrite
    semantics, reference: parquery/write.py:33-54)."""
    full = os.path.join(workdir, filename) if workdir else filename
    if os.path.isdir(full):
        shutil.rmtree(full)
    elif os.path.exists(full):
        os.remove(full)
    return full


def df_to_parquet(
    df: Any,
    filename: str,
    workdir: str | None = None,
    chunksize: int = 100_000,
    debug: bool = False,
    single_file: bool = True,
) -> str:
    """Write a DataFrame/Table to ZSTD Parquet; returns the output path."""
    full = create_full_filename(filename, workdir)

    # Spark DataFrame → distributed write
    if hasattr(df, "sparkSession"):
        out = df.coalesce(1) if single_file else df
        out.write.mode("overwrite").parquet(full, compression="zstd")
        if single_file:
            _promote_single_part(full)
        return full

    if pl is not None and isinstance(df, pl.DataFrame):
        table = df.to_arrow()  # zero-copy (reference: parquery/write.py:126-130)
    elif pd is not None and isinstance(df, pd.DataFrame):
        table = pa.Table.from_pandas(df, preserve_index=False)
    elif isinstance(df, pa.Table):
        table = df
    else:
        raise TypeError(
            f"Unsupported input type for df_to_parquet: {type(df).__name__}"
        )

    with pq.ParquetWriter(full, table.schema, compression="zstd") as writer:
        for offset in range(0, max(table.num_rows, 1), chunksize):
            writer.write_table(table.slice(offset, chunksize))
    return full


def _promote_single_part(directory: str) -> None:
    """Replace the Spark output directory with its single part file, so the
    result is one Parquet *file* — the reference's unit of distribution."""
    parts = [
        f for f in os.listdir(directory)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]
    if len(parts) != 1:  # keep directory layout if unexpected
        return
    tmp = directory + ".__single__"
    os.replace(os.path.join(directory, parts[0]), tmp)
    shutil.rmtree(directory)
    os.replace(tmp, directory)
