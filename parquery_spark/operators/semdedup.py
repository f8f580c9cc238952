"""SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", 2023): semantic near-duplicate
pruning = k-means the embedding space, then drop any document whose cosine
similarity to an EARLIER document in its own cluster exceeds a threshold.

The clustering is what makes it scale: candidate pairs are intra-cluster
only, Σ_i c_i² instead of n².  That bound only holds if **k grows with the
corpus** — with constant k the expected cell size c_i = n/k grows linearly
and the pair volume quadratically.  Hence ``k`` here derives from a
``target_cell`` size (``k = ceil(n/target)``, pairs ≈ n·target/2 — linear
in n; default ``DEFAULT_TARGET_CELL``): pick the largest cell a single
shuffle partition comfortably verifies.  (The old ``ceil(sqrt(n))``
default is gone — it silently grew cells AND the centroid matrix with n;
pass ``k=ceil(sqrt(n))`` explicitly if you want that trade.)

Training shape (the 100 TB path, round 7):

* **Assignment is a vectorized Arrow-batched kernel**, not a SQL join:
  per batch, distances to all k centroids accumulate position-by-position
  in numpy (``acc += (x_p - c_p)²`` left-to-right over positions) — the
  EXACT fold order of the SQL ``SUM`` over a position-contiguous explode
  and of DuckDB's fold, so assignments stay bit-identical to the oracle
  recipe while never materializing the O(n·k·d) joined row set.  FLOPs
  run in numpy at memory bandwidth instead of one hash-agg row each.
* **Lloyd iterations train on a deterministic hash-sample** (md5-mod
  stride over ids — portable to the SQL oracle) capped at
  ``sample_rows``; only the FINAL assignment touches the full corpus,
  once.  Per-iteration driver/broadcast bytes are the k × dim centroid
  matrix with ``k ≤ min(k, sample_rows)`` — bounded by the training
  budget, independent of n.
* Centroid updates stay DECIMAL-exact means rounded to ``digits``
  (summation-order independent) over the exploded TRAINING set only.

Oracle-exact by construction (the q141/q167/q221 recipe): deterministic
seeding (the k smallest training ids, a ``TakeOrderedAndProject`` — never
a full sort), bit-identical per-round centroids on both engines,
assignments tie-broken by (distance, cluster), and pair similarities
rounded before thresholding.

The reference (visualfabriq/parquery) has no similarity/dedup operators —
this module is part of the beyond-reference LLM-pipeline surface
(SURVEY.md §2.4).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


#: default expected cell size when neither ``k`` nor ``target_cell`` is
#: given — keeps intra-cell pair volume linear in n (≈ n·256/2) and is
#: small enough that one shuffle partition verifies a cell comfortably
DEFAULT_TARGET_CELL = 256

#: default Lloyd training budget: iterations run on a deterministic
#: hash-sample of at most this many vectors, so per-iteration cost and
#: the k × dim centroid matrix are bounded regardless of corpus size
DEFAULT_SAMPLE_ROWS = 65536


def choose_k(
    n: int, target_cell: int | None = None, k: int | None = None
) -> int:
    """Cluster count for a corpus of ``n`` vectors: explicit ``k`` wins,
    else ``ceil(n / target_cell)`` with ``target_cell`` defaulting to
    :data:`DEFAULT_TARGET_CELL` (linear-in-n pair volume; the old
    ``ceil(sqrt(n))`` default grew cells with n and is no longer
    implicit)."""
    if k is not None:
        return max(2, min(k, n))
    if target_cell is None:
        target_cell = DEFAULT_TARGET_CELL
    return max(2, min(math.ceil(n / target_cell), n))


def _sample_filter(id_col, stride: int):
    """Deterministic, engine-portable membership test for the training
    sample: keep ids whose 60-bit md5 prefix is ≡ 0 (mod stride).  The
    identical predicate in the SQL oracle is
    ``('0x' || substr(md5(id::VARCHAR), 1, 15))::BIGINT % stride = 0``."""
    h = F.conv(
        F.substring(F.md5(id_col.cast("long").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    return h % stride == 0


#: sampled training runs driver-side when the hash-sample holds at most
#: this many vectors (≈ a few MB of arrays); larger samples keep the
#: distributed Lloyd loop
_DRIVER_TRAIN_MAX = 4096


def _driver_centroid_update(arrs, assigned, valid, digits):
    """The DECIMAL-exact centroid update, driver-side, mirroring the SQL
    ``round(cast(sum(cast(x as decimal(28,12))) as double) / count(1),
    digits)`` over the exploded (cluster, pos, x) rows digit-for-digit:

    * double → decimal(28,12): Spark casts through the SHORTEST decimal
      representation (``BigDecimal.valueOf`` = ``Double.toString``) and
      rounds HALF_UP to 12 places — ``Decimal(repr(x))`` is the same
      shortest representation, quantized the same way;
    * the decimal SUM is exact on both sides (order-free);
    * decimal → double and the final HALF_UP round to ``digits`` are
      correctly-rounded conversions on both sides.

    A null component inside a vector contributes to the count but not
    the sum, exactly like ``SUM``/``COUNT(1)`` over the explode.
    Returns ``[{cluster, pos, c}, ...]`` rows for
    :func:`_centroid_matrix`."""
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1E-12")
    qd = Decimal(1).scaleb(-digits)
    sums: dict[tuple[int, int], Decimal] = {}
    counts: dict[tuple[int, int], int] = {}
    for i in np.nonzero(valid)[0]:
        c = int(assigned[i])
        for p, x in enumerate(arrs[i]):
            key = (c, p)
            counts[key] = counts.get(key, 0) + 1
            if x is not None:
                sums[key] = sums.get(key, Decimal(0)) + Decimal(
                    repr(float(x))
                ).quantize(q12, rounding=ROUND_HALF_UP)
    return [
        {
            "cluster": c,
            "pos": p,
            # an all-null position yields SQL NULL (the distributed path
            # would fail _centroid_matrix identically — no silent zero)
            "c": (
                float(
                    Decimal(
                        repr(float(sums[(c, p)]) / counts[(c, p)])
                    ).quantize(qd, rounding=ROUND_HALF_UP)
                )
                if (c, p) in sums
                else None
            ),
        }
        for (c, p) in counts
    ]


def _centroid_matrix(cent_rows):
    """(labels, C, clens): cluster labels ascending, the k × dim centroid
    matrix, and each centroid's own position count, from collected
    (cluster, pos, c) rows."""
    labels = sorted({int(r["cluster"]) for r in cent_rows})
    dim = max(int(r["pos"]) for r in cent_rows) + 1
    lab_ix = {c: i for i, c in enumerate(labels)}
    C = np.zeros((len(labels), dim), dtype=np.float64)
    clens = np.zeros(len(labels), dtype=np.int64)
    for r in cent_rows:
        i, p = lab_ix[int(r["cluster"])], int(r["pos"])
        C[i, p] = float(r["c"])
        clens[i] = max(clens[i], p + 1)
    return np.asarray(labels, dtype=np.int64), C, clens


def _nearest(arrs, labels, C, clens):
    """The assignment kernel's math, shared verbatim by the distributed
    pandas_udf pass and the driver-side sampled-training loop (round 12)
    so both produce bit-identical clusters by construction: distances
    accumulate ``(x_p - c_p)²`` position-by-position left-to-right in
    float64, ties break to the smallest cluster label, positions beyond
    either side's length contribute nothing.  ``arrs`` is a sequence of
    per-row vectors (None/empty = no assignment); returns ``(out,
    valid)`` int64/bool arrays."""
    k, d = C.shape
    uniform = bool((clens == d).all())
    n_rows = len(arrs)
    out = np.zeros(n_rows, dtype=np.int64)
    valid = np.zeros(n_rows, dtype=bool)
    lens = np.fromiter(
        (0 if a is None else len(a) for a in arrs),
        dtype=np.int64, count=n_rows,
    )
    for ln in np.unique(lens):
        if ln == 0:
            continue
        ix = np.nonzero(lens == ln)[0]
        X = np.empty((len(ix), ln), dtype=np.float64)
        for row, i in enumerate(ix):
            # float32 → float64 widening BEFORE arithmetic (exact),
            # the pinned CAST-to-DOUBLE discipline
            X[row, :] = np.asarray(arrs[i], dtype=np.float64)
        span = min(int(ln), d)
        acc = np.zeros((len(ix), k), dtype=np.float64)
        for p in range(span):
            diff = X[:, p, None] - C[None, :, p]
            sq = diff * diff
            if not uniform:
                # a centroid shorter than p has no pos-p row in the
                # SQL join: zero its contribution (×0.0 and +0.0 are
                # bit-exact identities on the non-negative acc)
                sq *= (p < clens)[None, :]
            acc += sq
        out[ix] = labels[np.argmin(acc, axis=1)]
        valid[ix] = True
    return out, valid


def _assign_with(emb: DataFrame, id_col: str, vec_col: str,
                 labels, C, clens):
    """One vectorized assignment pass: ``((__id, cluster) DataFrame,
    centroid broadcast)`` covering every vector with at least one
    component (SQL parity: an empty vector joins no positions and gets NO
    assignment row).  The caller may ``destroy()`` the broadcast once the
    result is fully consumed.

    Bit-identity contract: distances accumulate ``(x_p - c_p)²``
    position-by-position left-to-right in float64 — the same fold order
    as ``SUM`` over a position-contiguous explode (Spark hash-agg) and as
    the DuckDB oracle — and ties break to the smallest cluster label
    (labels ascend, ``argmin`` keeps the first minimum).  Positions
    beyond either side's length contribute nothing, matching the SQL
    inner join on ``pos``."""
    from pyspark.sql.functions import pandas_udf

    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((labels, C, clens))

    @pandas_udf("bigint")
    def _assign(v: pd.Series) -> pd.Series:
        labs, cents, cl = bc.value
        out, valid = _nearest(v.to_numpy(), labs, cents, cl)
        res = pd.Series(out).astype("Int64")
        res[~valid] = pd.NA
        return res

    df = emb.select(
        F.col(id_col).cast("long").alias("__id"),
        _assign(F.col(vec_col)).alias("cluster"),
    ).where(F.col("cluster").isNotNull())
    return df, bc


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
    sample_rows: int | None = DEFAULT_SAMPLE_ROWS,
    _expl: DataFrame | None = None,
    materialize: bool = True,
    n: int | None = None,
) -> DataFrame:
    """Deterministic, oracle-exact Lloyd assignment: ``(id_col, cluster)``
    one row per vector.  This IS the trained model artifact — persist it
    next to the corpus (stat-keyed, like the IVF index layout) and feed it
    back to :func:`semdedup` via ``assign=`` to skip re-training: the
    standard train-once / prune-per-batch split of a production pipeline.

    Execution shape (round 7): every assignment pass is the vectorized
    Arrow-batched kernel (:func:`_assign_with` — bit-identical fold order
    to the SQL/DuckDB recipe, no O(n·k·d) joined rows), and when the
    corpus exceeds ``sample_rows`` the Lloyd iterations run on a
    deterministic md5-mod hash-sample (:func:`_sample_filter`, portable
    to the SQL oracle — gated by q221) with only the FINAL pass touching
    the full corpus.  Per-iteration driver traffic is the k × dim rounded
    centroid matrix with k capped by the training-set size — bounded by
    the ``sample_rows`` budget, independent of n.  ``sample_rows=None``
    forces full-corpus training (the q167/q211 oracle setting at test
    SFs, where n is under the default budget anyway).

    ``_expl`` lets :func:`semdedup` (and :func:`~parquery_spark.operators.
    pq.pq_train`) share ITS persisted exploded relation with the centroid
    updates when training is unsampled — the owner of the handle
    unpersists it.  When this function owns its intermediates it
    materializes the returned assignment (persisted MEMORY_AND_DISK) and
    releases them before returning — callers ``unpersist()`` the result
    when done with the model artifact.

    ``n`` (round 12): callers that already know the corpus cardinality —
    a parquet footer count for a single-file relation — pass it and skip
    the ``count()`` job.  The training-sample count job is gone too: the
    seed ``limit(k)`` collect doubles as the sample probe (an empty
    collect IS the pathological-void signal, and a sample smaller than
    ``k`` simply returns every sample row — the same seed set the
    explicit count produced)."""
    spark = emb.sparkSession
    if n is None:
        n = emb.count()
    if n == 0:
        return spark.createDataFrame([], f"{id_col} long, cluster long")

    # -- training set: deterministic hash-sample once past the budget ----
    stride = 1
    if sample_rows is not None and n > sample_rows:
        stride = math.ceil(n / sample_rows)
    train = emb
    if stride > 1:
        train = emb.where(_sample_filter(F.col(id_col), stride))
    k = choose_k(n, target_cell, k)

    # deterministic seeds: the k smallest TRAINING ids
    # (TakeOrderedAndProject — k rows, never a global sort); seed id
    # doubles as the cluster label.  Seed vectors come back whole — the
    # k × dim matrix is the same driver-side index metadata every later
    # round ships, no explode involved.
    def _seed_collect(src):
        return (
            src.select(
                F.col(id_col).cast("long").alias("__id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .orderBy("__id")
            .limit(k)
            .collect()
        )

    # Driver-side sampled training (round 12, guide §1.2/§5): when the
    # hash-sample is small enough to hold on the driver, collect it ONCE
    # and run the whole Lloyd loop locally — the per-iteration
    # distributed round trips (an Arrow kernel pass + an exploded
    # aggregation + a collect, each a multi-stage job wave) collapse
    # into numpy on ≤ _DRIVER_TRAIN_MAX vectors.  Bit-identity holds by
    # construction: assignment calls the SAME :func:`_nearest` kernel
    # the executors run, and the centroid update mirrors the SQL's
    # decimal semantics digit-for-digit (cast-to-decimal(28,12) via the
    # shortest-repr string, exact decimal sum, correctly-rounded back-
    # conversion, HALF_UP round — pinned by a pytest differential
    # against the distributed update).  The final full-corpus pass stays
    # distributed, unchanged.
    sample = None
    if stride > 1 and iters > 1 and n // stride <= _DRIVER_TRAIN_MAX:
        sample = (
            train.select(
                F.col(id_col).cast("long").alias("__id"),
                F.col(vec_col).cast("array<double>").alias("v"),
            )
            .collect()
        )
        if not sample:
            sample = None  # hash void: fall through to the full fallback
        else:
            sample.sort(key=lambda r: r["__id"])
            raw_seeds = sample[:k]

    if sample is None:
        raw_seeds = _seed_collect(train)
        if not raw_seeds and stride > 1:
            # pathological hash void on a tiny corpus: train on
            # everything (the former explicit sample-count probe's
            # fallback, now reached only when the seed collect itself
            # comes back empty)
            train, stride = emb, 1
            raw_seeds = _seed_collect(train)
    seed_rows = [r for r in raw_seeds if r["v"]]  # empty vector = no cell
    if not seed_rows:
        return spark.createDataFrame([], f"{id_col} long, cluster long")
    labels = np.asarray([int(r["__id"]) for r in seed_rows], dtype=np.int64)
    dim = max(len(r["v"]) for r in seed_rows)
    C = np.zeros((len(labels), dim), dtype=np.float64)
    clens = np.zeros(len(labels), dtype=np.int64)
    for i, r in enumerate(seed_rows):
        C[i, : len(r["v"])] = np.asarray(r["v"], dtype=np.float64)
        clens[i] = len(r["v"])

    if sample is not None:
        arrs = np.empty(len(sample), dtype=object)
        for i, r in enumerate(sample):
            arrs[i] = r["v"]
        for _ in range(iters - 1):
            out_l, valid = _nearest(arrs, labels, C, clens)
            cent_rows = _driver_centroid_update(
                arrs, out_l, valid, digits
            )
            if not cent_rows:  # every training vector lost its assignment
                break
            labels, C, clens = _centroid_matrix(cent_rows)

    # exploded TRAINING relation — needed only for the DECIMAL-exact
    # centroid updates between rounds (bounded by the sample budget)
    owns_texpl = False
    texpl = None
    if iters > 1 and sample is None:
        if _expl is not None and stride == 1:
            texpl = _expl
        else:
            texpl = _explode(train, id_col, vec_col)
            owns_texpl = True

    spent_bc = []
    try:
        for _ in range(iters - 1 if sample is None else 0):
            assign_t, bc = _assign_with(train, id_col, vec_col,
                                        labels, C, clens)
            # registered BEFORE the collect so a failed round still
            # releases its centroid broadcast in the finally
            spent_bc.append(bc)
            cent_rows = (
                texpl.join(assign_t, "__id")
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
            if not cent_rows:  # every training vector lost its assignment
                break
            labels, C, clens = _centroid_matrix(cent_rows)

        # the FINAL broadcast is deliberately NOT destroyed here: it backs
        # the returned plan (a persisted relation can still recompute after
        # executor loss / cache eviction).  Once the caller releases the
        # result, the closure reference drops and Spark's ContextCleaner
        # reclaims the broadcast — bounded by one k×dim matrix per LIVE
        # model, not per call.
        out, _final_bc = _assign_with(emb, id_col, vec_col, labels, C, clens)
        out = out.select(F.col("__id").alias(id_col), "cluster")
        if _expl is None and materialize:
            # materialize the model artifact so repeat consumers don't
            # re-run the full-corpus assignment pass.  CALLER RELEASES
            # (``unpersist()`` when done with the model) — or passes
            # ``materialize=False`` for a single-consumer plan (the
            # returned relation depends only on the source + the final
            # centroid broadcast, so it recomputes in one kernel pass at
            # action time, leaving the CacheManager flat).
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
            out.count()
        return out
    finally:
        if owns_texpl:
            texpl.unpersist()
        for bc in spent_bc:  # iteration centroids are dead after .collect()
            try:
                bc.destroy()
            except Exception:  # pragma: no cover - session teardown race
                pass


def semdedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    iters: int = 3,
    threshold: float = 0.4,
    target_cell: int | None = None,
    digits: int = 6,
    sample_rows: int | None = DEFAULT_SAMPLE_ROWS,
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
            sample_rows=sample_rows, _expl=expl,
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
