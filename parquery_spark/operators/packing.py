"""Training-shard packing: assign documents to fixed-token-budget shards in
a deterministic global order — the step that turns a cleaned corpus into
the fixed-size shard files a training run streams.

``shard_id = floor(tokens_before / shard_size)`` over the global order:
documents are never split, shards overflow by at most one document, and the
assignment is a pure function of (order, sizes) — re-runs give identical
shards.

The global running sum is computed as a **distributed prefix sum**, not a
single-partition window (Spark executes an un-partitioned ``SUM OVER
(ORDER BY)`` in ONE task — correct and fine in an oracle, fatal at corpus
scale):

1. range-partition by the order column (contiguous, sorted ranges);
2. per-partition running sums via a window PARTITIONED by the physical
   partition id — all partitions in parallel;
3. the per-partition totals (one row per partition) come to the driver and
   prefix-sum there — a few KB regardless of corpus size;
4. each row's global prefix = local prefix + its partition's offset
   (broadcast map-side join).

The reference has no ordering/packing operators (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def prefix_sum(
    df: DataFrame,
    value_col: Column | str,
    order_col: str,
    out_col: str = "prefix_sum",
    num_partitions: int | None = None,
    inclusive: bool = True,
) -> DataFrame:
    """``df`` plus a global running sum of ``value_col`` in ``order_col``
    order — the distributed prefix sum (range partition → parallel
    per-partition windows → driver-side fold of one row per partition),
    NEVER Spark's single-task un-partitioned ``SUM OVER (ORDER BY)``.

    ``inclusive=False`` gives the exclusive prefix (sum of strictly
    preceding rows) — what shard packing needs."""
    sz = F.col(value_col) if isinstance(value_col, str) else value_col
    src = df.withColumn("__sz", sz.cast("long"))
    if num_partitions:
        src = src.repartitionByRange(num_partitions, F.col(order_col))
    else:
        src = src.repartitionByRange(F.col(order_col))
    src = src.withColumn("__pid", F.spark_partition_id())

    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = src.withColumn("__cum", F.sum("__sz").over(w)).persist()

    # one row per partition — a scalar collect, not a data collect
    totals = {
        r["__pid"]: r["t"]
        for r in local.groupBy("__pid").agg(F.max("__cum").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], ["__pid", "__off"]
    )
    prefix = F.col("__cum") + F.col("__off")
    if not inclusive:
        prefix = prefix - F.col("__sz")
    return (
        local.join(F.broadcast(offset_df), "__pid")
        .withColumn(out_col, prefix)
        .drop("__pid", "__sz", "__cum", "__off")
    )


def pack_shards(
    df: DataFrame,
    size_col: Column | str,
    shard_size: int,
    order_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``df``'s columns plus ``shard_id``.

    ``size_col`` is the per-row cost (token count — a Column expression is
    allowed, e.g. ``token_count("text")``); ``order_col`` is the total
    order (must be unique — doc id, sort key); ``shard_size`` is the
    budget per shard in the same unit as ``size_col``.
    """
    out = prefix_sum(
        df, size_col, order_col, "__before",
        num_partitions=num_partitions, inclusive=False,
    )
    return (
        # integer DIV, not double `/`: exact for any long prefix (a double
        # quotient would lose ulps past 2^53 total tokens)
        out.withColumn("shard_id", F.expr(f"__before DIV {int(shard_size)}"))
        .drop("__before")
    )


def write_shards(
    df: DataFrame,
    path: str,
    size_col: Column | str,
    shard_size: int,
    order_col: str,
    mode: str = "overwrite",
) -> str:
    """The training-data last mile: pack documents into fixed-budget
    shards, then write one hive partition per shard
    (``path/shard_id=N/...``).  A training run streams shard directories
    in order; each holds ≈ ``shard_size`` tokens of whole documents.
    Re-runs produce byte-identical shard assignment (deterministic prefix
    sum), so incremental re-trains see stable shards."""
    from parquery_spark.sources.parquet import write_partitioned

    packed = pack_shards(df, size_col, shard_size, order_col)
    return write_partitioned(packed, path, ["shard_id"], mode=mode)


def sliding_chunks(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    size: int = 64,
    stride: int = 32,
) -> DataFrame:
    """Retrieval-side packing: split each document's token array into
    overlapping sliding windows (``size`` tokens every ``stride``) — the
    standard RAG chunking shape.  One row per (doc, chunk) with the
    chunk's start offset, actual length, and text fingerprint.

    Pure Column plan: ``sequence(0, n-1, stride)`` generates the start
    offsets JVM-side and ``explode`` fans them out (factor ≈
    tokens/stride — linear in corpus tokens, no join); the per-chunk
    ``slice`` runs AFTER the explode, one slice per emitted chunk (never
    inside a ``transform`` lambda — the HOF-hoisting hazard).  Callers
    with single-file inputs must ``fan_out`` first, as with every
    row-multiplying explode."""
    n = F.size(tokens_col)
    starts = df.where(n > 0).select(
        id_col,
        F.col(tokens_col).alias("__w"),
        F.explode(
            F.sequence(F.lit(0), n - 1, F.lit(int(stride)))
        ).alias("start"),
    )
    chunk = F.slice("__w", F.col("start") + 1, size)
    return starts.select(
        id_col,
        (F.col("start") / stride).cast("long").alias("chunk_idx"),
        F.col("start").cast("long").alias("start_tok"),
        F.least(F.lit(size), F.size("__w") - F.col("start"))
        .cast("long")
        .alias("chunk_len"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_fp"),
    )
