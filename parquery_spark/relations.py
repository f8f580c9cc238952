"""Hot-relation cache: the engine's buffer-pool analog for small tables.

The reference opens the Parquet file fresh on every ``aggregate_pq`` call and
leans on the OS page cache for re-reads (reference: parquery/
aggregate_pyarrow.py:60-74 — ``pq.ParquetFile`` per query).  Spark's
equivalent of "the file is hot" is an ``InMemoryRelation``: this module keeps
an LRU of persisted, columnar-cached DataFrames for *small* inputs so that
repeated queries over the same file skip listing, footer decode, and the
parquet scan entirely.

Two scale-aware rules:

* **Only small inputs are cached** (default < 256 MiB total).  A 100 TB
  table never lands here — the lazy plan path streams it with full predicate
  pushdown; caching is a small-hot-table optimization, exactly like keeping
  dimension tables in a buffer pool.
* **Single-row-group files are re-sliced.**  Parquet assigns whole row
  groups to tasks, so a 600 k-row single-row-group file caps every
  downstream partial aggregation at parallelism 1 no matter how many cores
  exist.  The cache build repartitions to ``rows // ROWS_PER_SLICE`` slices
  (bounded by the scheduler's default parallelism) once, and every
  subsequent query runs its map stage in parallel over cached columnar
  batches.

Staleness: entries are keyed by ``(abspath, mtime_ns, size)`` per file.  A
replaced file (``os.replace``) produces a new key — and the stale entry is
**eagerly unpersisted** before the new one is built, because Spark's shared
``CacheManager`` matches plans structurally (path-based, not
mtime-based): without the eviction, a fresh read of the replaced file would
silently resolve to the stale in-memory copy.

Sessions: cached data lives in the SparkContext-wide ``SharedState`` cache
manager, so a relation persisted through one ``SparkSession`` is picked up
by plan-equality from every other session of the same context (the
small-query session in :mod:`parquery_spark.aggregate` relies on this).
DataFrame handles themselves are per-session; the cache stores one per
``(key, session)``.
"""

from __future__ import annotations

import glob as _glob
import os
import threading
from collections import OrderedDict
from typing import Sequence

import pyarrow.parquet as papq
from pyspark.sql import DataFrame, SparkSession

from parquery_spark import fs

#: Inputs at or above this total size are never cached (scale path).
MAX_CACHED_INPUT_BYTES = int(
    os.environ.get("PARQUERY_SPARK_RELATION_CACHE_MAX_FILE_BYTES", str(256 << 20))
)

#: LRU capacity — number of distinct (path-set, stat) entries kept persisted.
MAX_CACHED_RELATIONS = int(
    os.environ.get("PARQUERY_SPARK_RELATION_CACHE_ENTRIES", "16")
)

#: Target rows per cached partition slice; chosen so a partial aggregation
#: over one slice is a few milliseconds of work (scheduling overhead and
#: per-slice work stay balanced in local mode and on executors alike).
ROWS_PER_SLICE = 40_000

_ENABLED = os.environ.get("PARQUERY_SPARK_RELATION_CACHE", "1") not in ("0", "false")

_lock = threading.RLock()


class _Entry:
    __slots__ = ("slices", "by_session", "persisted_df")

    def __init__(self, slices: int):
        self.slices = slices
        self.by_session: dict[int, DataFrame] = {}
        self.persisted_df: DataFrame | None = None


#: stat-key -> _Entry (LRU: most-recently-used last)
_relations: "OrderedDict[tuple, _Entry]" = OrderedDict()
#: path-set -> last seen stat-key (to detect replaced files)
_by_paths: dict[tuple, tuple] = {}

#: (session id, stat-key) -> LAZY analyzed relation (round 12).  Building a
#: ``spark.read.parquet(path)`` costs ~90 ms of driver work (file listing,
#: footer/schema decode, py4j round-trips) REGARDLESS of file size, paid on
#: every call even though the resulting plan object is immutable for a given
#: file version.  This cache reuses the analyzed DataFrame by stat identity:
#: nothing is persisted (no executor memory, no TableCacheQueryStage — AQE
#: exchange reuse is unaffected), PushedFilters/pruning stay per-query, and
#: a replaced file gets a fresh relation through the stat key exactly like
#: the persisted cache above.  At cluster scale this is the guide-§6
#: file-listing-cache advice applied at the engine layer: re-listing a
#: heavily partitioned table per query is minutes of driver time.
_lazy_relations: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_MAX_LAZY_RELATIONS = int(
    os.environ.get("PARQUERY_SPARK_LAZY_RELATION_ENTRIES", "512")
)
_LAZY_ENABLED = os.environ.get(
    "PARQUERY_SPARK_LAZY_RELATION_CACHE", "1"
) not in ("0", "false")


def _lazy_read(spark: SparkSession, path_list: Sequence[str]) -> DataFrame:
    """``_read`` through the lazy analyzed-relation cache (plan reuse only,
    never data).  Falls back to a fresh read when stat identity is
    unavailable (remote URI without a metadata backend)."""
    if not _LAZY_ENABLED:
        return _read(spark, path_list)
    try:
        key = (id(spark), _stat_key(path_list))
    except OSError:
        return _read(spark, path_list)
    with _lock:
        df = _lazy_relations.get(key)
        if df is not None:
            _lazy_relations.move_to_end(key)
            return df
    df = _read(spark, path_list)
    with _lock:
        _lazy_relations[key] = df
        while len(_lazy_relations) > _MAX_LAZY_RELATIONS:
            _lazy_relations.popitem(last=False)
    return df


#: (abspath, mtime_ns, size) -> frozenset of column names; footer schema is
#: immutable for a given file version, so pre-flight checks skip the disk
#: read + thrift decode on every repeat query (a few ms/path saved)
_schema_names: "OrderedDict[tuple, frozenset]" = OrderedDict()
_MAX_SCHEMA_ENTRIES = 256


class SchemaUnreadableError(Exception):
    """A LOCAL file was opened but its footer/header could not be parsed
    (corrupt or truncated).  Reference parity: such a file contributes an
    empty column set and the query answers empty (reference:
    parquery/tool.py:135-142, aggregate.py:165-170).  Distinct from the
    backend-absent ``OSError`` (remote path, no metadata backend), which
    callers must treat as "assume the columns exist" / fail loud."""


def schema_names(path: str) -> frozenset:
    """Column names, driver-side and cheap, cached by file stat identity:
    parquet/ORC from the footer, CSV from the header row, JSON-lines from
    the keys of the first rows (a sample — untyped formats have no footer;
    columns appearing only deep in the file surface at read time via
    Spark's own inference).

    Filesystem-agnostic: local paths read directly; remote URIs stat and
    open through :mod:`parquery_spark.fs` (Hadoop FS / pyarrow.fs).  When
    no backend can answer, this RAISES ``OSError`` — callers must treat
    "schema unknown" as "assume the columns exist" and let the Spark scan
    fail loud, never as an empty schema (the silent-empty-result class).
    A *local* file that opens but fails to parse raises
    :class:`SchemaUnreadableError` instead — the reference's tolerant
    contract maps that to an empty result."""
    mtime_ns, size = fs.stat(path)
    key = (fs.canonical(path), mtime_ns, size)
    with _lock:
        names = _schema_names.get(key)
        if names is not None:
            _schema_names.move_to_end(key)
            return names
    if fs.is_local(path):
        try:
            names = _parse_schema_names(path)
        except OSError:
            # I/O failure on a local file (EACCES, transient NFS EIO,
            # EMFILE...) is NOT the corrupt-content class: propagate, so
            # the caller assumes the columns exist and the Spark scan
            # fails LOUD — rebranding it "unreadable" would silently drop
            # the file from the scan (the silent-partial-result class).
            # pyarrow's ArrowIOError subclasses OSError, which is exactly
            # right: an unreadable disk is an I/O problem, not parity.
            raise
        except Exception as exc:
            # the file opened and CONTENT failed to parse (ArrowInvalid
            # magic/footer, csv/json/unicode garbage): reference parity —
            # corrupt local files contribute an empty column set
            raise SchemaUnreadableError(f"unreadable schema: {path}") from exc
    else:
        # remote: any failure (no backend, auth, transient) must NOT look
        # like "empty schema" — propagate so callers assume-present
        names = _parse_schema_names(path)
    with _lock:
        _schema_names[key] = names
        while len(_schema_names) > _MAX_SCHEMA_ENTRIES:
            _schema_names.popitem(last=False)
    return names


def _parse_schema_names(path: str) -> frozenset:
    fmt = format_of(path)
    if fmt == "csv":
        import csv as _csv
        import io as _io

        with fs.open_input(path) as fh:
            text = _io.TextIOWrapper(fh, newline="")
            names = frozenset(next(_csv.reader(text), []))
            text.detach()
    elif fmt == "json":
        import io as _io
        import json as _json

        keys: set[str] = set()
        with fs.open_input(path) as fh:
            text = _io.TextIOWrapper(fh)
            for _ in range(100):
                line = text.readline()
                if not line:
                    break
                line = line.strip()
                if line:
                    try:
                        keys |= set(_json.loads(line))
                    except ValueError:
                        pass
            text.detach()
        names = frozenset(keys)
    elif fmt == "orc":
        from pyarrow import orc as _orc

        if fs.is_local(path):
            names = frozenset(_orc.ORCFile(fs.local_part(path)).schema.names)
        else:
            with fs.open_input(path) as fh:
                names = frozenset(_orc.ORCFile(fh).schema.names)
    else:
        if fs.is_local(path):
            names = frozenset(papq.read_schema(fs.local_part(path)).names)
        else:
            with fs.open_input(path) as fh:
                names = frozenset(papq.read_schema(fh).names)
    return names


def _stat_key(paths: Sequence[str]) -> tuple:
    return tuple((fs.canonical(p), *fs.stat(p)) for p in paths)


#: extension → source format.  Parquet is the reference's only format
#: (SURVEY.md §2.1); CSV / JSON-lines / ORC are extension surface — same
#: query API, tolerant-schema semantics, and relation cache on top.
_FORMATS = {
    "parquet": "parquet", "pq": "parquet",
    "csv": "csv",
    "json": "json", "jsonl": "json", "ndjson": "json",
    "orc": "orc",
}


def format_of(path: str) -> str:
    return _FORMATS.get(path.rsplit(".", 1)[-1].lower(), "parquet")


def _format_of_all(paths: Sequence[str]) -> str:
    fmts = {format_of(p) for p in paths}
    if len(fmts) > 1:
        raise ValueError(
            f"cannot mix source formats in one query: {sorted(fmts)} ({paths})"
        )
    return fmts.pop()


_GLOB_MAGIC = frozenset("*?[")


def has_glob_magic(path: str) -> bool:
    """True when ``path`` is a glob pattern rather than a literal path."""
    return any(ch in _GLOB_MAGIC for ch in path)


def expand_globs(paths: Sequence[str]) -> list[str]:
    """Expand glob patterns to sorted literal paths (driver-side, cheap —
    one directory listing per pattern).  Non-pattern paths pass through
    untouched; a pattern matching nothing contributes nothing (callers
    that want missing-input errors check emptiness themselves).  Sorted
    expansion keeps multi-file schema-merge and cache keys deterministic
    across runs.

    A path that EXISTS literally is never treated as a pattern —
    ``*?[`` are all legal filename characters, and a real file named
    ``events[2024].parquet`` must keep resolving to itself, not to the
    character class ``[2024]``.

    Remote URIs expand through Hadoop ``globStatus`` (the semantics
    Spark's own file index applies); when no backend can expand a remote
    pattern it passes through VERBATIM — Spark's readers glob natively,
    so deferring beats wrongly reporting zero matches."""
    out: list[str] = []
    for p in paths:
        if has_glob_magic(p) and not fs.exists(p):
            hits = fs.glob(p)
            if hits is None:
                out.append(p)
            else:
                out.extend(hits)
        else:
            out.append(p)
    return out


def _read(spark: SparkSession, paths: Sequence[str]) -> DataFrame:
    fmt = _format_of_all(paths)
    if fmt == "csv":
        # header + inference: column names from row 1, types from a scan —
        # acceptable for ad-hoc CSV; at scale callers convert to parquet
        # (sources.compact_dataset) or pass typed data through parquet
        return (
            spark.read.option("header", "true")
            .option("inferSchema", "true")
            .csv(list(paths))
        )
    if fmt == "json":
        return spark.read.json(list(paths))
    if fmt == "orc":
        return spark.read.orc(*paths)
    reader = spark.read
    if len(paths) > 1:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*paths)


def _plan_slices(paths: Sequence[str]) -> int:
    """Driver-side, footer-only: how many partitions the cached relation
    should have.  More slices than the scan would naturally produce →
    repartition once at build.  Non-parquet sources have no row metadata;
    slice by bytes instead (~2 MiB of source text per slice).  Remote
    inputs keep their natural partitioning (0): the re-slice is a repair
    for the degenerate under-split local layout, not worth a remote
    footer fetch.

    The natural-parallelism estimate is BYTE-based (round 12): Spark
    packs files into splits by ``maxPartitionBytes``, NOT by row group —
    a 20 MB file with 15 row groups still scans as ONE task, so the
    former row-group comparison left every mid-sized cached table at 1-3
    partitions and capped heavy downstream work (pair-explode joins,
    shingling) at that parallelism (measured: q128's basket self-join ran
    on 3 tasks)."""
    if not all(fs.is_local(p) for p in paths):
        return 0
    if any(format_of(p) != "parquet" for p in paths):
        total = sum(fs.getsize(p) for p in paths)
        return max(1, min(total // (2 << 20), os.cpu_count() or 8))
    rows = 0
    total = 0
    for p in paths:
        md = papq.read_metadata(fs.local_part(p))
        rows += md.num_rows
        total += fs.getsize(p)
    want = max(1, min(rows // ROWS_PER_SLICE, os.cpu_count() or 8))
    # one split per maxPartitionBytes (default 128 MB) is what the scan
    # yields; re-slice only when that under-uses the machine
    natural = max(1, total // (128 << 20))
    return want if want > natural else 0  # 0 → keep natural partitioning


def get_relation(
    spark: SparkSession, paths: str | Sequence[str], cache: bool = True
) -> DataFrame:
    """Resolve a parquet path list to a DataFrame, through the hot cache.

    Large inputs (≥ :data:`MAX_CACHED_INPUT_BYTES`) and disabled-cache calls
    go straight to ``spark.read`` — fully lazy, nothing persisted.
    """
    path_list = [paths] if isinstance(paths, str) else list(paths)
    path_list = expand_globs(path_list)
    if not path_list:
        from parquery_spark.tool import MissingInputError

        raise MissingInputError(f"no files match: {paths}")
    if not (_ENABLED and cache):
        return _lazy_read(spark, path_list)
    try:
        total = sum(fs.getsize(p) for p in path_list)
    except OSError:
        # unknown size (e.g. remote URI with no metadata backend): go
        # straight to the lazy uncached scan — the scale path
        return _read(spark, path_list)
    if total >= MAX_CACHED_INPUT_BYTES:
        return _lazy_read(spark, path_list)

    try:
        key = _stat_key(path_list)
    except OSError:
        return _read(spark, path_list)
    paths_id = tuple(fs.canonical(p) for p in path_list)

    with _lock:
        stale_key = _by_paths.get(paths_id)
        if stale_key is not None and stale_key != key:
            # file replaced in place: evict BEFORE building the new relation,
            # or the shared CacheManager would resolve the new (structurally
            # identical) plan to the stale in-memory copy
            _evict(stale_key)
        _by_paths[paths_id] = key

        entry = _relations.get(key)
        if entry is None:
            entry = _Entry(_plan_slices(path_list))
            _relations[key] = entry
        _relations.move_to_end(key)

        sid = id(spark)
        df = entry.by_session.get(sid)
        if df is None:
            df = _read(spark, path_list)
            if entry.slices:
                df = df.repartition(entry.slices)
            entry.by_session[sid] = df
            if entry.persisted_df is None:
                # persist once; every session's equivalent plan hits the
                # shared CacheManager by structural plan matching
                entry.persisted_df = df.persist()

        while len(_relations) > MAX_CACHED_RELATIONS:
            oldest = next(iter(_relations))
            if oldest == key:
                break
            _evict(oldest)
    return df


#: (stat-key-or-paths-id, session id) -> registered temp-view name
_views: dict[tuple, str] = {}
_view_seq = 0


def get_relation_view(
    spark: SparkSession, paths: str | Sequence[str], cache: bool = True
) -> str:
    """Resolve a parquet path list to a registered temp-view name — the
    single-Py4J-roundtrip query surface: ``spark.sql`` over the view costs
    one gateway call, where the equivalent Column-API plan construction
    costs dozens (~0.7 ms each).

    The view is registered once per (relation identity, session); replaced
    files get a fresh relation through :func:`get_relation`'s staleness key,
    and the view is re-pointed at it."""
    global _view_seq
    path_list = [paths] if isinstance(paths, str) else list(paths)
    df = get_relation(spark, path_list, cache=cache)
    try:
        ident = _stat_key(path_list)
    except OSError:
        ident = tuple(fs.canonical(p) for p in path_list)
    # cache=True and cache=False views live in separate namespaces: the
    # uncached (streaming-scan) contract must never resolve through a view
    # registered from a persisted relation, and vice versa — and downstream
    # plan caches key on the SQL text, so the names must differ too.
    vkey = (ident, id(spark), bool(cache))
    with _lock:
        name = _views.get(vkey)
        if name is None:
            _view_seq += 1
            name = f"__pq_rel_{_view_seq}" + ("" if cache else "_raw")
            df.createOrReplaceTempView(name)
            _views[vkey] = name
    return name


#: (session id, sql, frozen args) -> analyzed DataFrame.  A prepared-
#: statement cache: Spark DataFrames are immutable lazy plans, so re-using
#: one re-runs the job but skips parse, analysis, physical planning, and the
#: codegen cache lookup (~40-60 ms/query at local scale).  Staleness safety:
#: the SQL text embeds the relation's temp-view name, and view names are
#: minted fresh per (path-set, mtime, size) identity — a replaced file gets a
#: new view name, hence a new cache key, so a stale plan can never be served.
_plans: "OrderedDict[tuple, DataFrame]" = OrderedDict()
MAX_CACHED_PLANS = int(os.environ.get("PARQUERY_SPARK_PLAN_CACHE_ENTRIES", "128"))


def cached_sql(spark: SparkSession, sql: str, args: dict | None = None) -> DataFrame:
    """``spark.sql`` through the prepared-plan cache.

    ``args`` values are bound literals (part of the analyzed plan), so they
    are part of the key; unhashable values fall through to a direct call.
    """
    try:
        akey = tuple(sorted(args.items())) if args else ()
        key = (id(spark), sql, akey)
        hash(key)  # force now: string keys sort without comparing values,
        # so an unhashable VALUE (e.g. a list) survives sorted() and would
        # otherwise blow up inside the cache lookup below
    except TypeError:
        return spark.sql(sql, args=args) if args else spark.sql(sql)
    with _lock:
        df = _plans.get(key)
        if df is not None:
            _plans.move_to_end(key)
            return df
    df = spark.sql(sql, args=args) if args else spark.sql(sql)
    with _lock:
        _plans[key] = df
        while len(_plans) > MAX_CACHED_PLANS:
            _plans.popitem(last=False)
    return df


def _evict(key: tuple) -> None:
    entry = _relations.pop(key, None)
    for vkey in [k for k in _views if k[0] == key]:
        _views.pop(vkey, None)
    if entry is not None and entry.persisted_df is not None:
        try:
            entry.persisted_df.unpersist(blocking=False)
        except Exception:
            pass  # session may already be stopped


def invalidate(paths: str | Sequence[str] | None = None) -> None:
    """Drop cached relations — all of them, or just the given path set."""
    with _lock:
        if paths is None:
            for key in list(_relations):
                _evict(key)
            _by_paths.clear()
            return
        path_list = [paths] if isinstance(paths, str) else list(paths)
        paths_id = tuple(fs.canonical(p) for p in path_list)
        key = _by_paths.pop(paths_id, None)
        if key is not None:
            _evict(key)
