"""Product quantization (PQ): the compression rung between int8 scalar
quantization (:mod:`parquery_spark.operators.quantize`) and the IVF
coarse quantizer (:mod:`parquery_spark.operators.ivf`) — together the
standard IVF-PQ ANN stack (Jégou et al., "Product quantization for
nearest neighbor search", TPAMI 2011).

A d-dim vector splits into ``m`` contiguous subvectors; each subspace is
k-means'd independently (reusing the deterministic, literal-centroid
Lloyd loop from :mod:`operators.semdedup`) and a vector is stored as its
``m`` nearest-centroid codes — ``m * ceil(log2(k))`` bits instead of
``32 * d``.  Query-time ADC (asymmetric distance computation) scans
codes, not vectors: per query, the m x k table of
query-subvector-to-centroid squared distances is precomputed (KB-scale
metadata, broadcast), and a candidate's approximate distance is the sum
of m table lookups.

Scale shapes: training explodes each subspace once behind a ``fan_out``
(the semdedup discipline); codebooks are m*k*(d/m) = k*d rounded doubles
— driver-side index metadata exactly like the IVF centroid matrix; the
ADC scan is a broadcast join of the code relation against the per-query
lookup table followed by a partial-aggregated sum and a
TakeOrderedAndProject top-k — no crossJoin against raw vectors, no
full-precision distance on the scan path.
"""

from __future__ import annotations

from functools import reduce

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from parquery_spark.operators.semdedup import _explode, kmeans_assign


def pq_train(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 16,
    iters: int = 2,
    digits: int = 6,
    sample_rows: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns ``(codes, codebook)``:

    - ``codes``: one row per vector — ``(id_col, codes array<long>)``,
      ``codes[s]`` = the cluster label chosen in subspace ``s``;
    - ``codebook``: ``(sub, cluster, pos, c)`` — per-subspace centroid
      components at subspace-local positions (rounded to ``digits``,
      the same decimal-mean recipe as the Lloyd loop itself).

    The vector dimension must divide evenly by ``m``.

    ``sample_rows`` defaults to ``None`` (full-corpus Lloyd training —
    the oracle-exact setting gated by q211) rather than inheriting
    :func:`kmeans_assign`'s budget default: a caller whose gate compares
    against a full-corpus oracle must not silently switch to sampled
    training when the corpus outgrows the budget.  Pass an explicit
    budget to opt in to hash-sampled training at scale (the q221-gated
    path).
    """
    dim_row = emb.select(F.size(vec_col).alias("d")).take(1)
    if not dim_row:
        spark = emb.sparkSession
        return (
            spark.createDataFrame([], f"{id_col} long, codes array<bigint>"),
            spark.createDataFrame(
                [], "sub int, cluster long, pos int, c double"
            ),
        )
    d = dim_row[0]["d"]
    if d % m != 0:
        raise ValueError(f"dim {d} not divisible by m={m} subspaces")
    w = d // m

    transient: list[DataFrame] = []

    def _train_subspace(s: int):
        """One subspace's Lloyd train + codebook — independent of every
        other subspace, so the m trainings run on concurrent driver
        threads (Spark schedules their jobs side by side; at m=8 the
        cold train is wall-clocked by the slowest subspace, not the
        sum)."""
        sub = emb.select(
            F.col(id_col).cast("long").alias(id_col),
            F.slice(F.col(vec_col), s * w + 1, w).alias("embedding"),
        )
        # ONE persisted exploded relation per subspace, shared between
        # the Lloyd loop (via _expl) and the codebook mean below —
        # and released in the finally, so a pq_train call pins nothing
        # beyond its own (persisted, returned) codes/codebook
        expl = _explode(sub, id_col, "embedding")
        transient.append(expl)  # registered as soon as it exists, so the
        # finally releases it even when a SIBLING subspace thread fails
        assign = kmeans_assign(
            sub, id_col=id_col, vec_col="embedding", k=k, iters=iters,
            digits=digits, sample_rows=sample_rows, _expl=expl,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        transient.append(assign)
        # subspace codebook: decimal-exact mean of member subvectors at
        # each local position (labels are seed ids — arbitrary longs —
        # which ADC joins through; density of 0..k-1 is not required)
        book = (
            expl.withColumnRenamed("__id", id_col)
            .join(assign, id_col)
            .groupBy("cluster", "pos")
            .agg(
                F.round(
                    F.sum(F.col("x").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1)),
                    digits,
                ).alias("c")
            )
            .select(F.lit(s).alias("sub"), "cluster", "pos", "c")
        )
        code_part = assign.select(id_col, F.lit(s).alias("sub"), "cluster")
        return s, code_part, book

    try:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
            trained = list(pool.map(_train_subspace, range(m)))
        code_parts = [t[1] for t in trained]
        book_parts = [t[2] for t in trained]

        codes = reduce(lambda a, b: a.unionByName(b), code_parts)
        codes = (
            codes.groupBy(id_col)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("sub", "cluster"))
                    ),
                    lambda p: p["cluster"],
                ).alias("codes")
            )
        )
        codebook = reduce(lambda a, b: a.unionByName(b), book_parts)
        # materialize the outputs, then (finally) release every per-subspace
        # cache — otherwise each pq_train call leaves m exploded + m
        # assignment relations pinned for the session lifetime
        codes = codes.persist(StorageLevel.MEMORY_AND_DISK)
        codebook = codebook.persist(StorageLevel.MEMORY_AND_DISK)
        codes.count()
        codebook.count()
        return codes, codebook
    finally:
        for h in transient:
            try:
                h.unpersist()
            except Exception:  # pragma: no cover - session teardown race
                pass


def adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    topk: int = 10,
    m: int | None = None,
    dims: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: for each query vector, the ``topk``
    corpus ids by summed subspace table distance.

    ``queries`` must be SMALL (the probe batch): its per-query m x k
    distance table — built by joining query components against the
    codebook — is broadcast into the code scan.  Output:
    ``(q_id, id_col, adc_dist, rank)``.

    ``dims`` (round 12): callers that already hold the probe vectors
    driver-side pass the vector length and skip the ``take(1)`` probe
    job this function otherwise runs to discover it.  ``dims=None`` on
    an empty probe batch keeps the probe-and-empty-result path."""
    def _empty():
        # keep the non-empty path's column types (q_id/id ride through
        # from the inputs; only adc_dist/rank are synthesized)
        qt = dict(queries.dtypes).get(q_id, "bigint")
        it = dict(codes.dtypes).get(id_col, "bigint")
        return codes.sparkSession.createDataFrame(
            [], f"{q_id} {qt}, {id_col} {it}, adc_dist double, rank int"
        )

    # query subvector components at (sub, pos) — positions are
    # subspace-local to match the codebook layout
    mm = m
    if mm is None:
        top_sub = codebook.agg(F.max("sub")).take(1)[0][0]
        if top_sub is None:  # empty codebook (pq_train on an empty corpus)
            return _empty()
        mm = top_sub + 1
    if dims is None:
        dim_row = queries.select(F.size(q_vec).alias("d")).take(1)
        if not dim_row:  # empty probe batch — mirror pq_train's empty path
            return _empty()
        dims = dim_row[0]["d"]
    if dims % mm != 0:
        raise ValueError(
            f"query dim {dims} not divisible by m={mm} subspaces"
        )
    w = dims // mm
    qcomp = queries.select(
        q_id,
        F.posexplode(F.col(q_vec).cast("array<double>")).alias("gpos", "qx"),
    ).select(
        q_id,
        (F.col("gpos") / w).cast("int").alias("sub"),
        (F.col("gpos") % w).alias("pos"),
        "qx",
    )
    # per-query distance table: (q_id, sub, cluster, dist) — m*k rows per
    # query, the ADC lookup structure
    table = (
        qcomp.join(codebook, ["sub", "pos"])
        .groupBy(q_id, "sub", "cluster")
        .agg(
            F.sum(
                (F.col("qx") - F.col("c")) * (F.col("qx") - F.col("c"))
            ).alias("dist")
        )
    )
    # scan: explode each vector's m codes, look up, sum — the shuffle
    # carries (q_id, id, partial sum); the lookup table is broadcast
    scan = codes.select(
        id_col,
        F.posexplode("codes").alias("sub", "cluster"),
    )
    d = (
        scan.join(F.broadcast(table), ["sub", "cluster"])
        .groupBy(q_id, id_col)
        .agg(F.round(F.sum("dist"), 6).alias("adc_dist"))
    )
    # row_number + immediate `<= k` filter is Spark's WindowGroupLimit
    # trigger: each partition keeps only its local top-k BEFORE the
    # per-query exchange, so no task ever sorts a corpus-sized
    # partition (plan-asserted in tests/test_scale_plans.py)
    wnd = F.row_number().over(
        Window.partitionBy(q_id).orderBy("adc_dist", id_col)
    )
    return d.withColumn("rank", wnd).where(F.col("rank") <= topk)
