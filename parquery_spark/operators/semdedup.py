"""SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): semantic near-duplicate
pruning = k-means the embedding space, then drop any document whose cosine
similarity to an EARLIER document in its own cluster exceeds a threshold.

The clustering is what makes it scale: candidate pairs are intra-cluster
only, Σ_i c_i² instead of n².  That bound only holds if **k grows with the
corpus** — with constant k the expected cell size c_i = n/k grows linearly
and the pair volume quadratically.  Hence ``k`` here defaults to
``ceil(sqrt(n))`` (cells of expected size √n, total pairs ≈ n·√n/2) and
can instead be derived from a ``target_cell`` size (``k = ceil(n/target)``,
pairs ≈ n·target/2 — linear in n), which is the 100 TB setting: pick the
largest cell a single shuffle partition comfortably verifies.

Oracle-exact by construction (the q141/q167 recipe): deterministic seeding
(the k smallest ids, a ``TakeOrderedAndProject`` — never a full sort),
centroid means computed in DECIMAL (summation-order independent) and
rounded to ``digits`` so both engines feed bit-identical centroids into
each assignment round, assignments tie-broken by (distance, cluster), and
pair similarities rounded before thresholding.

Per-round centroids are materialized to the driver: k × dim rounded
doubles are index metadata (KB–MB at any sane k — the same contract as
:mod:`parquery_spark.operators.ivf`'s centroid matrix), and re-injecting
them as a literal relation keeps every round's plan flat — no
iteratively-deepening lineage, no Janino blowup, and each round reuses the
persisted exploded relation instead of recomputing the whole chain.

The reference (visualfabriq/parquery) has no similarity/dedup operators —
this module is part of the beyond-reference LLM-pipeline surface
(SURVEY.md §2.4).
"""

from __future__ import annotations

import math

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def choose_k(
    n: int, target_cell: int | None = None, k: int | None = None
) -> int:
    """Cluster count for a corpus of ``n`` vectors: explicit ``k`` wins,
    else ``ceil(n / target_cell)``, else the ``ceil(sqrt(n))`` default."""
    if k is not None:
        return max(2, min(k, n))
    if target_cell is not None:
        return max(2, min(math.ceil(n / target_cell), n))
    return max(2, min(math.ceil(math.sqrt(n)), n))


def _explode(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # fan_out BEFORE the explode: a single-file corpus scans as one split,
    # and every round's n·k·d distance evaluation would otherwise run in
    # that one task; hashing on the id also co-locates the per-vector
    # aggregations that follow
    from parquery_spark.operators.util import fan_out

    return fan_out(emb, id_col).select(
        F.col(id_col).cast("long").alias("__id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "pos", "x"
        ),
    ).persist(StorageLevel.MEMORY_AND_DISK)


def kmeans_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 3,
    target_cell: int | None = None,
    digits: int = 6,
    _expl: DataFrame | None = None,
) -> DataFrame:
    """Deterministic, oracle-exact Lloyd assignment: ``(id_col, cluster)``
    one row per vector.  This IS the trained model artifact — persist it
    next to the corpus (stat-keyed, like the IVF index layout) and feed it
    back to :func:`semdedup` via ``assign=`` to skip re-training: the
    standard train-once / prune-per-batch split of a production pipeline.

    ``_expl`` lets :func:`semdedup` (and :func:`~parquery_spark.operators.
    pq.pq_train`) share ITS persisted exploded relation with training —
    the heaviest intermediate must exist once, not once per phase, and the
    owner of the handle unpersists it.  When this function owns the
    explode (``_expl=None``) it materializes the returned assignment
    (persisted MEMORY_AND_DISK) and releases the exploded relation before
    returning — callers ``unpersist()`` the result when done with the
    model artifact."""
    spark = emb.sparkSession
    n = emb.count()
    if n == 0:
        return spark.createDataFrame([], f"{id_col} long, cluster long")
    k = choose_k(n, target_cell, k)
    owns_expl = _expl is None
    expl = _explode(emb, id_col, vec_col) if owns_expl else _expl

    # deterministic seeds: the k smallest ids (TakeOrderedAndProject —
    # k rows, never a global sort); seed id doubles as the cluster label.
    # Seed centroids are collected immediately so EVERY round — including
    # the first — runs the identical literal-centroid plan shape: one
    # whole-stage-codegen compile serves all rounds instead of one per
    # distinct shape (measured 2-3x on the cold path).
    seeds = emb.select(F.col(id_col).cast("long").alias("__id")).orderBy(
        "__id"
    ).limit(k)
    cent_rows = (
        expl.join(F.broadcast(seeds), "__id")
        .select(
            F.col("__id").alias("cluster"), "pos", F.col("x").alias("c")
        )
        .collect()
    )

    try:
        assign = None
        for _ in range(iters):
            cents = spark.createDataFrame(
                cent_rows, "cluster long, pos int, c double"
            )
            d = (
                expl.join(F.broadcast(cents), "pos")
                .groupBy("__id", "cluster")
                .agg(
                    F.sum(
                        (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                    ).alias("d")
                )
            )
            # argmin via min(struct(d, cluster)): lexicographic struct order
            # IS the (distance, cluster) tie-break, and min partial-aggregates
            # map-side — no row_number window, one less exchange per round
            assign = (
                d.groupBy("__id")
                .agg(F.min(F.struct("d", "cluster")).alias("m"))
                .select("__id", F.col("m.cluster").alias("cluster"))
            )
            if _ < iters - 1:
                cent_rows = (
                    expl.join(assign, "__id")
                    .groupBy("cluster", "pos")
                    .agg(
                        F.round(
                            F.sum(F.col("x").cast("decimal(28,12)"))
                            .cast("double")
                            / F.count(F.lit(1)),
                            digits,
                        ).alias("c")
                    )
                    .collect()
                )

        out = assign.select(F.col("__id").alias(id_col), "cluster")
        if owns_expl:
            # materialize the model artifact, then release the exploded
            # relation — the n·d intermediate must not outlive training
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            out.count()
        return out
    finally:
        if owns_expl:
            expl.unpersist()


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 3,
    threshold: float = 0.4,
    target_cell: int | None = None,
    digits: int = 6,
    assign: DataFrame | None = None,
) -> DataFrame:
    """Return the PRUNE set: one row per dropped vector —
    ``(id_col, cluster, max_sim_to_earlier)`` for every vector whose
    rounded cosine to some earlier (smaller-id) member of its cluster is
    ``>= threshold``.  Anti-join the corpus against this to keep survivors.

    ``assign`` short-circuits training with a precomputed
    :func:`kmeans_assign` relation (e.g. reloaded from a stat-keyed
    parquet layout) — the prune phase is then the only distributed work.

    Shapes: the exploded (id, pos, x) relation persists once and feeds
    seeding, every assignment round, the norm computation, and both sides
    of the intra-cluster join; assignment distances partial-aggregate
    map-side; the pair join's key is (cluster, pos) so dots also
    partial-aggregate; there is no crossJoin and no driver-side loop over
    rows — the only driver materialization is the k × dim rounded
    centroid matrix per round (index metadata, see module docstring).

    Lifecycle: the prune set is materialized here (persisted — it is the
    small output, one row per dropped vector) so the heavyweight
    intermediates (exploded relation, assignment) can be released before
    returning; callers ``unpersist()`` the result when done."""
    spark = emb.sparkSession
    expl = _explode(emb, id_col, vec_col)
    if assign is None:
        assign = kmeans_assign(
            emb, id_col, vec_col, k, iters, target_cell, digits,
            _expl=expl,
        )
    # persist BEFORE the emptiness probe so the probe's job is the one
    # that materializes the cache, not a throwaway recompute
    assign = assign.select(
        F.col(id_col).cast("long").alias("__id"), "cluster"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if not assign.take(1):
            return spark.createDataFrame(
                [], f"{id_col} long, cluster long, max_sim_to_earlier double"
            )
        norms = expl.groupBy("__id").agg(
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm")
        )
        sides = expl.join(assign, "__id").join(norms, "__id")
        a = sides.select(
            "cluster",
            F.col("__id").alias("id_a"),
            "pos",
            F.col("x").alias("xa"),
            F.col("nrm").alias("na"),
        )
        b = sides.select(
            "cluster",
            F.col("__id").alias("id_drop"),
            "pos",
            F.col("x").alias("xb"),
            F.col("nrm").alias("nb"),
        )
        dots = (
            a.join(b, ["cluster", "pos"])
            .where(F.col("id_a") < F.col("id_drop"))
            .groupBy("cluster", "id_a", "id_drop", "na", "nb")
            .agg(F.sum(F.col("xa") * F.col("xb")).alias("dot"))
        )
        sims = dots.select(
            "cluster",
            "id_drop",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), digits).alias(
                "sim"
            ),
        )
        out = (
            sims.where(F.col("sim") >= threshold)
            .groupBy(F.col("id_drop").alias(id_col), "cluster")
            .agg(F.max("sim").alias("max_sim_to_earlier"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        out.count()
        return out
    finally:
        expl.unpersist()
        assign.unpersist()
