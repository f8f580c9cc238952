"""Spark logical-plan builder for the parquery aggregation contract.

The reference dispatches a normalized query spec to one of two single-node
engines (reference: parquery/aggregate.py:185-206).  Here the "engine" is a
declarative Spark DataFrame plan: Catalyst provides predicate pushdown,
column pruning, and two-phase hash aggregation (partial per input split +
final after shuffle) for free — including for non-decomposable ops like
``mean``/``stddev``, which the reference's PyArrow engine had to special-case
via SAFE_PREAGGREGATE gating (reference: parquery/tool.py:37,
parquery/aggregate_pyarrow.py:135-138).

Scale notes (design target: 1000 executors, 100 TB):

* All pre-flight tolerant-schema checks (missing file / missing columns /
  missing filter columns) read only the Parquet footer on the driver — no
  Spark job, no scan (reference does the same: parquery/tool.py:123-142).
* The returned plan is **lazy**; nothing is collected here.  Callers choose
  the materialization boundary (``toArrow``/``toPandas``/``write``).
* The group-by shuffles only the requested dimensions; low-cardinality
  dimension shuffles are coalesced at runtime by AQE.
* ``count_distinct`` plans as Spark's Expand + partial aggregation — the
  scalable distributed strategy; no driver-side distinct set.
"""

from __future__ import annotations

import os
from functools import reduce
from typing import Any, Sequence

import pyarrow.parquet as papq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquery_spark import fs, relations, tool

# op name → Spark aggregate expression builder.
# Semantics pinned in SURVEY.md §2.3 (divergences documented there):
#  * std/stddev  → sample stddev (ddof=1), matching the reference's DuckDB
#    engine (reference: parquery/aggregate_duckdb.py:308-309); its PyArrow
#    engine used population stddev — the engines disagreed.
#  * count_na    → count of nulls per the reference README.md:61; the
#    reference implementation was broken in both engines (mapped to plain
#    COUNT / raised ArrowKeyError).
#  * one         → deterministic MIN, matching the reference's DuckDB engine
#    (reference: parquery/aggregate_duckdb.py:316); F.first would be
#    nondeterministic under parallel execution.
_AGG_BUILDERS = {
    "sum": F.sum,
    "mean": F.avg,
    "avg": F.avg,
    "std": F.stddev_samp,
    "stddev": F.stddev_samp,
    "count": F.count,
    "count_na": lambda c: F.count(F.when(F.col(c).isNull(), F.lit(1))),
    "count_distinct": F.countDistinct,
    "sorted_count_distinct": F.countDistinct,
    "min": F.min,
    "max": F.max,
    "one": F.min,
    # beyond-reference aggregate extensions (absent from the reference's
    # 10-op whitelist, SURVEY.md §2.3):
    "median": F.median,
    "approx_count_distinct": F.approx_count_distinct,
}


def agg_expr(col: str, op: str, output: str) -> Column:
    """Build one aliased Spark aggregate expression from a measure triple."""
    try:
        builder = _AGG_BUILDERS[op.lower()]
    except KeyError:
        raise NotImplementedError(
            f"Aggregation operation {op!r} is not supported; valid operations: "
            f"{sorted(_AGG_BUILDERS)}"
        ) from None
    return builder(col).alias(output)


def filter_expr(col: str, op: str, value: Any) -> Column:
    """One filter triple → a typed Column predicate.

    Unlike the reference's DuckDB engine — which interpolated raw ``str(v)``
    into SQL, breaking string literals and inviting injection (reference:
    parquery/aggregate_duckdb.py:371-402; SURVEY.md §4 caveat) — ``lit()``
    binds values as typed expressions, so string/date filters are safe.
    """
    c = F.col(col)
    if op == "in":
        return c.isin(list(value))
    if op in ("not in", "nin"):
        return ~c.isin(list(value))
    if op in ("=", "=="):
        return c == F.lit(value)
    if op == "!=":
        return c != F.lit(value)
    if op == ">":
        return c > F.lit(value)
    if op == ">=":
        return c >= F.lit(value)
    if op == "<":
        return c < F.lit(value)
    if op == "<=":
        return c <= F.lit(value)
    raise NotImplementedError(
        f"Filter operator {op!r} is not supported; valid operators: "
        f"{list(tool.VALID_FILTER_OPS)}"
    )


def combined_filter(data_filter: Sequence[Sequence[Any]]) -> Column | None:
    """AND-fold filter triples (reference: parquery/aggregate_pyarrow.py:336-341)."""
    if not data_filter:
        return None
    return reduce(
        lambda a, b: a & b, (filter_expr(col, op, v) for col, op, v in data_filter)
    )


# op name → SQL aggregate template for the single-roundtrip SQL fast path.
# MUST stay semantically identical to _AGG_BUILDERS (same Spark engine, same
# expressions — only the construction surface differs).
_SQL_AGGS = {
    "sum": "SUM({c})",
    "mean": "AVG({c})",
    "avg": "AVG({c})",
    "std": "STDDEV_SAMP({c})",
    "stddev": "STDDEV_SAMP({c})",
    "count": "COUNT({c})",
    "count_na": "COUNT(CASE WHEN {c} IS NULL THEN 1 END)",
    "count_distinct": "COUNT(DISTINCT {c})",
    "sorted_count_distinct": "COUNT(DISTINCT {c})",
    "min": "MIN({c})",
    "max": "MAX({c})",
    "one": "MIN({c})",
    "median": "MEDIAN({c})",
    "approx_count_distinct": "APPROX_COUNT_DISTINCT({c})",
}

_SQL_FILTER_OPS = {
    "=": "=", "==": "=", "!=": "!=", ">": ">", ">=": ">=", "<": "<", "<=": "<=",
}


def _qi(ident: str) -> str:
    """Backquote-quote an identifier for Spark SQL."""
    return "`" + ident.replace("`", "``") + "`"


def _sql_where(
    filters: Sequence[Sequence[Any]],
) -> tuple[str, dict[str, Any]]:
    """Filter triples → (WHERE clause, named parameters).

    Values are bound as **named parameters** (``spark.sql(..., args=...)``),
    never interpolated — the same injection-safety contract as the Column
    path's ``lit()`` (the reference's DuckDB engine interpolated ``str(v)``
    and was injectable; SURVEY.md §4)."""
    if not filters:
        return "", {}
    parts: list[str] = []
    args: dict[str, Any] = {}
    for i, (col, op, value) in enumerate(filters):
        c = _qi(col)
        if op in ("in", "not in", "nin"):
            values = list(value)
            neg = op != "in"
            if not values:
                # isin([]) semantics: empty IN-list matches nothing
                parts.append("1=1" if neg else "1=0")
                continue
            names = [f"f{i}_{j}" for j in range(len(values))]
            args.update(dict(zip(names, values)))
            inlist = ", ".join(f":{n}" for n in names)
            parts.append(f"{c} {'NOT IN' if neg else 'IN'} ({inlist})")
        elif op in _SQL_FILTER_OPS:
            args[f"f{i}"] = value
            parts.append(f"{c} {_SQL_FILTER_OPS[op]} :f{i}")
        else:
            raise NotImplementedError(
                f"Filter operator {op!r} is not supported; valid operators: "
                f"{list(tool.VALID_FILTER_OPS)}"
            )
    return " WHERE " + " AND ".join(parts), args


def empty_result_plan(spark: SparkSession, result_cols: Sequence[str]) -> DataFrame:
    """Zero-row result with null-typed columns
    (reference: parquery/tool.py:222-237 — ``pa.null()`` schema)."""
    schema = T.StructType([T.StructField(c, T.NullType()) for c in result_cols])
    return spark.createDataFrame([], schema)


def build_aggregation_plan(
    spark: SparkSession,
    file_name: str | Sequence[str],
    groupby_cols: Sequence[str],
    measure_cols: Sequence[Any],
    data_filter: Sequence[Sequence[Any]] | None = None,
    aggregate: bool = True,
    standard_missing_id: int = tool.STANDARD_MISSING_ID,
    handle_missing_file: bool = True,
    use_relation_cache: bool = True,
) -> DataFrame:
    """Build the lazy Spark plan implementing ``aggregate_pq`` semantics.

    Mirrors the reference lifecycle steps 1-6 (SURVEY.md §3;
    reference: parquery/aggregate.py:142-215):
    normalize → plan result schema → pre-flight footer checks →
    filter/group plan → missing-column splice.
    """
    groupby_cols = list(groupby_cols)
    measures = tool.normalize_measure_cols(measure_cols)
    filters = tool.normalize_data_filter(data_filter)
    result_cols = tool.get_result_columns(groupby_cols, measures)

    # -- pre-flight, driver-side, footer-only (no Spark job) ---------------
    # Multi-file form: the reference's production pattern is one process per
    # file with results recombined by the caller (reference: README.md:4,159);
    # here the file list is ONE distributed query.  Missing files are
    # skipped (or raise, per handle_missing_file); a column missing from
    # only some files surfaces as nulls via mergeSchema, so filters on it
    # exclude those files' rows — the per-file "unknown dimension
    # contributes nothing" contract, preserved across the dataset.
    # All existence/stat/footer probes go through parquery_spark.fs — on
    # s3a://hdfs://gs:// URIs the POSIX calls this replaces reported
    # "missing" for files that exist, silently emptying the result.  The
    # shim's failure posture is the opposite: a path no backend can probe
    # is assumed PRESENT and the Spark scan raises the real error.
    paths = [file_name] if isinstance(file_name, str) else list(file_name)
    live_paths = []
    for p in paths:
        if fs.exists(p):
            # literal paths win even when they contain glob magic chars
            # ('[', '*', '?' are legal filename characters)
            live_paths.append(p)
        elif relations.has_glob_magic(p):
            # glob → sorted literal paths; an empty match behaves exactly
            # like one missing file (skip, or raise per handle_missing_file)
            hits = relations.expand_globs([p])
            if hits:
                live_paths.extend(hits)
            elif not handle_missing_file:
                raise tool.MissingInputError(f"File {p} does not exist")
        elif not handle_missing_file:
            raise tool.MissingInputError(f"File {p} does not exist")
    if not live_paths:
        return empty_result_plan(spark, result_cols)

    requested = {*groupby_cols, *(m[0] for m in measures), *(f[0] for f in filters)}
    existing: set[str] = set()
    schema_unknown = False
    readable_paths = []
    for p in live_paths:
        try:
            existing |= relations.schema_names(p) & requested
            readable_paths.append(p)
        except relations.SchemaUnreadableError:
            # reference parity: a LOCAL file that opens but whose footer/
            # header cannot be parsed (corrupt/truncated) contributes an
            # empty column set — it is excluded from the scan, and a query
            # with no readable columns answers empty (reference:
            # parquery/tool.py:135-142, aggregate.py:165-170)
            continue
        except Exception:
            # schema UNKNOWN (remote path with no metadata backend, auth or
            # transient failure): cannot PROVE any column absent — proceed
            # with every requested column assumed present and let the scan
            # surface the real error.  Treating "unknown" as "empty
            # schema" would silently zero the result.
            schema_unknown = True
            readable_paths.append(p)
    live_paths = readable_paths
    if schema_unknown:
        existing = set(requested)
    if not existing or not live_paths:
        return empty_result_plan(spark, result_cols)
    if any(f[0] not in existing for f in filters):
        # "the real value for the dimension is unknown for the file, the
        # result should also be zero" (reference: parquery/tool.py:145-178)
        return empty_result_plan(spark, result_cols)

    live_groupby = [c for c in groupby_cols if c in existing]
    live_measures = [m for m in measures if m[0] in existing]
    if not live_groupby and not live_measures and aggregate:
        return empty_result_plan(spark, result_cols)

    # -- the Spark plan: ONE generated SQL statement over a registered view -
    # Semantics identical to the Column-API construction this replaces (same
    # Catalyst plan); the SQL surface exists because building the plan
    # expression-by-expression costs dozens of Py4J roundtrips (~0.7 ms
    # each, measured ~90 ms/query) while spark.sql() costs one.  Small
    # inputs resolve through the hot-relation cache (columnar in-memory,
    # re-sliced for parallelism); large inputs stream lazily with full
    # parquet pushdown — relations.get_relation_view applies the size gate.
    view = relations.get_relation_view(spark, live_paths, cache=use_relation_cache)
    where, args = _sql_where(filters)

    # Small cached inputs: COUNT(DISTINCT c) → SIZE(COLLECT_SET(c)).  Spark
    # plans COUNT(DISTINCT) as Expand + two aggregate/exchange rounds (three
    # stages); collect_set is a single aggregation (one exchange, two
    # stages) — measured ~2× faster at this scale.  Gated to the cached
    # small-input path because collect_set materializes per-group distinct
    # sets in executor memory: exactly right under the 256 MiB cache bound,
    # wrong for a 100 TB high-cardinality column, which keeps Spark's
    # Expand-based distributed plan.  CAST keeps the engine's BIGINT
    # count-distinct output type.
    sql_aggs = _SQL_AGGS
    if use_relation_cache and _cached_small_input(live_paths):
        sql_aggs = dict(
            _SQL_AGGS,
            count_distinct="CAST(SIZE(COLLECT_SET({c})) AS BIGINT)",
            sorted_count_distinct="CAST(SIZE(COLLECT_SET({c})) AS BIGINT)",
        )

    # engine columns, in the engine's output order
    if aggregate:
        if live_measures:
            for _, op, _ in live_measures:
                if op.lower() not in sql_aggs:
                    raise NotImplementedError(
                        f"Aggregation operation {op!r} is not supported; "
                        f"valid operations: {sorted(_AGG_BUILDERS)}"
                    )
            select = [_qi(c) for c in live_groupby] + [
                f"{sql_aggs[op.lower()].format(c=_qi(col))} AS {_qi(out)}"
                for col, op, out in live_measures
            ]
            group = (
                " GROUP BY " + ", ".join(_qi(c) for c in live_groupby)
                if live_groupby else ""
            )
            distinct = ""
            engine_cols = live_groupby + [m[2] for m in live_measures]
        else:
            select = [_qi(c) for c in live_groupby]
            group = ""
            distinct = "DISTINCT "
            engine_cols = list(live_groupby)
    else:
        # pass-through mode: sorted distinct input columns, raw rows
        # (reference: parquery/aggregate_duckdb.py:337-341); the
        # missing-column splice below still applies (reference:
        # parquery/aggregate.py:209-215 runs in both modes)
        engine_cols = sorted({*live_groupby, *(m[0] for m in live_measures)})
        select = [_qi(c) for c in engine_cols]
        group = ""
        distinct = ""

    # -- splice missing columns post-engine ---------------------------------
    # Order matches the reference: engine columns first (extras dropped),
    # then missing measures (0.0), then missing dims (standard_missing_id)
    # (reference: parquery/tool.py:240-301).  The `out not in engine_cols`
    # test covers both modes: aggregated outputs are engine columns, and in
    # pass-through mode a renamed output (['m','op','out']) is absent even
    # when 'm' is live — the reference still splices 'out' = 0.0 there
    # while dropping 'm'.
    keep = set(result_cols)
    final = [s for c, s in zip(engine_cols, select) if c in keep]
    for _, _, out in measures:
        if out not in engine_cols:
            final.append(
                f"CAST({float(tool.STANDARD_MISSING_MEASURE)!r} AS DOUBLE) "
                f"AS {_qi(out)}"
            )
    for col in groupby_cols:
        if col not in engine_cols:
            final.append(f"{int(standard_missing_id)} AS {_qi(col)}")

    sql = (
        f"SELECT {distinct}{', '.join(final)} FROM {_qi(view)}{where}{group}"
    )
    return relations.cached_sql(spark, sql, args)


def _cached_small_input(paths: Sequence[str]) -> bool:
    """True when the input is under the hot-relation-cache size bound.
    Unknown sizes (remote URIs without a metadata backend) are NOT small —
    the scale path is the safe default."""
    try:
        return (
            sum(fs.getsize(p) for p in paths)
            < relations.MAX_CACHED_INPUT_BYTES
        )
    except OSError:
        return False
