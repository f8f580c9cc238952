"""Error-tolerant Python boundaries: the dead-letter pattern for UDF
stages.

A 100 TB mapInPandas stage WILL meet rows its Python logic can't handle
(corrupt blobs, pathological strings, schema drift survivors).  A naked
UDF exception kills the task, the retry hits the same row, and after
``spark.task.maxFailures`` the whole job dies — one poison row burns
hours of cluster work.  ``dead_letter_map`` runs the per-row function
under try/except INSIDE the Arrow batch loop and routes failures to an
error column instead of an exception: good rows flow on, bad rows carry
their diagnostic, and the caller decides what to do with the dead
letters (count them, quarantine them, alert).

This is plumbing, not magic: the row function must still be
deterministic, and batch-level failures (OOM, segfaults in native libs)
are out of scope — those need task-level isolation.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame


def dead_letter_map(
    df: DataFrame,
    row_fn: Callable,
    out_field: str,
    out_type: str,
    id_cols: list[str],
) -> DataFrame:
    """Apply ``row_fn(row_dict) -> value`` per row via mapInPandas,
    catching per-row exceptions.

    Output schema: ``id_cols`` + ``ok boolean`` + ``<out_field>
    <out_type>`` (null on failure) + ``err string`` (exception class +
    message on failure, null on success).
    """
    import pandas as pd

    schema = (
        ", ".join(f"{c} {t}" for c, t in _id_schema(df, id_cols))
        + f", ok boolean, {out_field} {out_type}, err string"
    )

    def _runner(batches):
        for pdf in batches:
            oks, vals, errs = [], [], []
            for rec in pdf.to_dict("records"):
                try:
                    vals.append(row_fn(rec))
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — the whole point
                    vals.append(None)
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            out = pdf[id_cols].copy()
            out["ok"] = oks
            out[out_field] = vals
            out["err"] = errs
            yield out

    return df.mapInPandas(_runner, schema)


def _id_schema(df: DataFrame, id_cols: list[str]) -> list[tuple[str, str]]:
    dt = dict(df.dtypes)
    return [(c, dt[c]) for c in id_cols]
