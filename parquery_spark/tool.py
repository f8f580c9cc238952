"""Pure-Python semantics layer: query-spec normalization, tolerant-schema
rules, column-name mapping.

This module is the faithful part of the port — it encodes the *contract* of
the reference API (parquery), independent of any execution engine:

* measure-spec normalization     (reference: parquery/tool.py:181-204)
* result-column computation      (reference: parquery/tool.py:207-220)
* filter-operator whitelist      (reference: parquery/tool.py:38)
* natural-name column mapping    (reference: parquery/tool.py:49-120)
* missing-column compensation    (reference: parquery/tool.py:240-301)

Everything engine-facing (Spark plans) lives in ``parquery_spark.plans``.
"""

from __future__ import annotations

from typing import Any, Literal, Sequence

try:  # capability flag exposed for API parity (reference: parquery/tool.py:12-19)
    import duckdb  # noqa: F401

    HAS_DUCKDB = True
except ImportError:  # pragma: no cover - env-dependent
    HAS_DUCKDB = False

#: Filter operators accepted by ``aggregate_pq`` (reference: parquery/tool.py:38).
VALID_FILTER_OPS = ("in", "not in", "nin", "=", "==", "!=", ">", ">=", "<=", "<")

#: Typed filter aliases (reference: parquery/tool.py:38-41) — a user porting
#: ``from parquery import DataFilter`` keeps working.
FilterOperator = Literal["in", "not in", "nin", "=", "==", "!=", ">", ">=", "<=", "<"]
FilterCondition = tuple[str, FilterOperator, Any]  # (column, operator, value(s))
DataFilter = list[FilterCondition] | list[list[Any]]  # typed or legacy format

#: Aggregation ops whose partial results can safely be re-aggregated.
#: Kept for API/documentation parity (reference: parquery/tool.py:37); Spark's
#: HashAggregate does correct partial/final decomposition for *all* ops, so
#: nothing in this package branches on it.
SAFE_PREAGGREGATE = frozenset({"min", "max", "sum", "one"})

#: Default fill for dimension columns absent from the file
#: (reference: parquery/aggregate.py:113).
STANDARD_MISSING_ID = -1

#: Default fill for measure columns absent from the file
#: (reference: parquery/aggregate.py:114, parquery/tool.py:285-288).
STANDARD_MISSING_MEASURE = 0.0

#: Legacy constant exposed for API parity; unused by the modern filter path
#: (reference: parquery/tool.py:36 — grep-verified dead in the reference too).
FILTER_CUTOVER_LENGTH = 10


class FilterValueError(ValueError):
    """Legacy exception type kept for API parity (reference: parquery/tool.py:45-46)."""


class MissingInputError(OSError):
    """An input path that must exist (``handle_missing_file=False``) does
    not.  A *hard* failure: unlike a transient ``OSError`` (stale NFS
    handle, replaced inode), retrying cannot help — ``aggregate_pq``'s
    retry-once wrapper re-raises this immediately instead of re-running
    the pre-flight (the reference retries only the engine aggregation,
    reference: parquery/aggregate_duckdb.py:144-166)."""


def normalize_measure_cols(
    measure_cols: Sequence[Any],
) -> list[list[str]]:
    """Normalize measure specs to ``[input, op, output]`` triples.

    Accepted shapes (reference: parquery/tool.py:181-204; README.md:46-55):

    * ``'m'``             → ``['m', 'sum', 'm']``
    * ``['m']``           → ``['m', 'sum', 'm']``
    * ``['m', 'op']``     → ``['m', 'op', 'm']``
    * ``['m', 'op', 'o']`` → unchanged
    """
    normalized: list[list[str]] = []
    for spec in measure_cols:
        if isinstance(spec, str):
            normalized.append([spec, "sum", spec])
        elif len(spec) == 1:
            normalized.append([spec[0], "sum", spec[0]])
        elif len(spec) == 2:
            normalized.append([spec[0], spec[1], spec[0]])
        elif len(spec) == 3:
            normalized.append([spec[0], spec[1], spec[2]])
        else:
            raise ValueError(f"Invalid measure specification: {spec!r}")
    return normalized


def get_result_columns(
    groupby_cols: Sequence[str], measure_cols: Sequence[Sequence[str]]
) -> list[str]:
    """Result schema: sorted union of groupby columns and measure output
    names (reference: parquery/tool.py:206-219 — ``sorted(set(...))``).
    """
    return sorted({*groupby_cols, *(spec[2] for spec in measure_cols)})


def normalize_data_filter(
    data_filter: Sequence[Sequence[Any]] | None,
) -> list[list[Any]]:
    """Validate and normalize filter triples ``[col, op, value(s)]``.

    * op must be in :data:`VALID_FILTER_OPS` — unknown ops raise
      ``NotImplementedError`` listing the valid set
      (reference: parquery/aggregate_pyarrow.py:331-335).
    * ``in`` / ``not in`` / ``nin`` tolerate a scalar value (wrapped to a
      1-list, reference: parquery/aggregate_pyarrow.py:315-318).
    """
    if not data_filter:
        return []
    normalized = []
    for triple in data_filter:
        if len(triple) != 3:
            raise ValueError(f"Filter must be [column, op, value]: {triple!r}")
        col, op, value = triple
        if op not in VALID_FILTER_OPS:
            raise NotImplementedError(
                f"Filter operator {op!r} is not supported; valid operators: "
                f"{list(VALID_FILTER_OPS)}"
            )
        if op in ("in", "not in", "nin") and not isinstance(value, (list, tuple, set)):
            value = [value]
        normalized.append([col, op, value])
    return normalized


# ---------------------------------------------------------------------------
# Natural-name mapping (reference: parquery/tool.py:49-120, README.md:201-225)
# ---------------------------------------------------------------------------

def to_natural_name(column: str) -> str:
    """``-`` → ``_n_`` so the column is a valid Python identifier."""
    return column.replace("-", "_n_")


def to_original_name(column: str) -> str:
    """``_n_`` → ``-`` (inverse of :func:`to_natural_name`)."""
    return column.replace("_n_", "-")


def df_to_natural_name(df):
    """Rename ``-`` columns to natural names on a Spark/pandas/Arrow table."""
    return _rename(df, to_natural_name)


def df_to_original_name(df):
    """Rename natural-name columns back to their ``-`` originals."""
    return _rename(df, to_original_name)


def _rename(df, fn):
    if hasattr(df, "column_names"):  # pyarrow.Table
        return df.rename_columns([fn(c) for c in df.column_names])
    new = [fn(c) for c in df.columns]
    if hasattr(df, "toDF"):  # Spark DataFrame
        return df.toDF(*new)
    is_polars = type(df).__module__.split(".")[0] == "polars"  # positive
    # detection (reference: parquery/tool.py:49-83 accepts polars in the
    # same positions).  The duck-type fallback keeps polars-SHAPED frames
    # (mapping-rename, no pandas .copy) working even if the module name
    # ever differs — but a positive polars match wins regardless of any
    # future polars release adding .copy.
    if is_polars or (hasattr(df, "rename") and not hasattr(df, "copy")):
        return df.rename(dict(zip(df.columns, new)))
    df = df.copy()
    df.columns = new
    return df
