"""Similarity search over embedding columns (``array<float>``): brute-force
cosine top-k as the exact baseline, random-hyperplane LSH bucketing as the
scale path, and embedding near-duplicate pairs.

Design for 100 TB:

* Vector math stays in JVM expressions (``zip_with`` + ``aggregate``) — no
  Python in the hot path; each row's cosine is a fused codegen loop.
* Brute-force top-k against one query is a narrow map + ``TakeOrderedAndProject``
  (no full sort, no shuffle of the corpus).
* The LSH path buckets vectors by sign-bit signature against a fixed set of
  deterministic hyperplanes; queries probe only matching buckets.  Recall is
  tuned by ``num_planes`` and multi-probe hamming radius.  Hyperplanes are
  generated from a seeded RNG so results are reproducible and oracle-testable.
* Near-dup pairs join only within buckets — candidate volume is controlled
  by the signature width, never O(n²).

The reference has no similarity operators (SURVEY.md §2.4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquery_spark.operators.util import fan_out


def _as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<double> columns — fused zip_with/aggregate."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_literal(vec: Column, q: list[float]) -> Column:
    """Dot product against a constant query vector.  Built as an array
    literal + fused zip_with/aggregate loop — NOT an unrolled 64-term sum,
    which would blow past Janino's method-size limit and knock the whole
    stage out of codegen."""
    arr = F.array(*[F.lit(float(x)) for x in q])
    return dot(_as_double(vec), arr)


def cosine_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    digits: int = 6,
) -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector.

    Plans as scan → narrow map (cosine) → global top-k (Spark's
    TakeOrderedAndProject: per-partition heap + driver merge of k rows —
    no full sort even at 10^10 rows).
    """
    qn = float(np.linalg.norm(query))
    v = _as_double(vec_col)
    sim = F.round(dot_literal(v, query) / (norm(v) * F.lit(qn)), digits)
    return (
        fan_out(df, id_col)
        .select(F.col(id_col), sim.alias("cosine_sim"))
        .orderBy(F.col("cosine_sim").desc(), F.col(id_col))
        .limit(k)
    )


def hyperplanes(dim: int, num_planes: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic random hyperplanes for sign-bit LSH."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((num_planes, dim))


def lsh_bucket(vec: Column | str, planes: np.ndarray) -> Column:
    """Sign-bit signature: bit j set iff dot(vec, plane_j) > 0."""
    v = _as_double(vec)
    expr = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        expr = expr + F.when(
            dot_literal(v, plane.tolist()) > 0, F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return expr


def cosine_topk_lsh(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 7,
    digits: int = 6,
) -> DataFrame:
    """Approximate cosine top-k: probe only buckets within ``probe_hamming``
    of the query's LSH bucket, then exact cosine on the candidates.

    At corpus scale the bucket column is a partition/cluster key, so the
    probe prunes both compute AND input (partition pruning on bucket).
    """
    planes = hyperplanes(len(query), num_planes, seed)
    qsig = sum(
        (1 << j) for j, p in enumerate(planes) if float(np.dot(p, query)) > 0
    )
    bucketed = fan_out(df, id_col).select(
        F.col(id_col), F.col(vec_col), lsh_bucket(vec_col, planes).alias("bucket")
    )
    candidates = bucketed.filter(
        F.bit_count(F.col("bucket").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    return cosine_topk(candidates, query, k, vec_col, id_col, digits)


def near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    seed: int = 7,
    digits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: vectors in
    the same sign-bit bucket are verified with exact cosine.  High
    thresholds ⇒ near-identical vectors ⇒ same bucket with high
    probability; join is quadratic only within buckets.

    Pass ``dim`` (the embedding width) explicitly when known: it is needed
    driver-side to generate the hyperplanes, and without it an extra
    Spark job (``first()``) probes the data — which also fails on an
    empty corpus."""
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError(
                f"cannot infer embedding dim from an empty corpus; pass "
                f"dim= explicitly (vec_col={vec_col!r})"
            )
        dim = len(first[0])
    planes = hyperplanes(dim, num_planes, seed)
    bucketed = fan_out(df, id_col).select(
        F.col(id_col),
        _as_double(vec_col).alias("v"),
        lsh_bucket(vec_col, planes).alias("bucket"),
    )
    a = bucketed.select(
        "bucket", F.col(id_col).alias("id_a"), F.col("v").alias("v_a")
    )
    b = bucketed.select(
        "bucket", F.col(id_col).alias("id_b"), F.col("v").alias("v_b")
    )
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    sim = F.round(cosine(F.col("v_a"), F.col("v_b")), digits)
    return (
        pairs.select("id_a", "id_b", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


# ---------------------------------------------------------------------------
# Persisted ANN index: hive layout partitioned by LSH bucket
# ---------------------------------------------------------------------------

def hamming_ball(center: int, num_planes: int, radius: int) -> list[int]:
    """All bucket ids within ``radius`` bit-flips of ``center`` — the
    multi-probe set, enumerated driver-side (|ball| = Σ C(num_planes, r),
    e.g. 79 buckets for num_planes=12, radius=2)."""
    from itertools import combinations

    out = []
    for r in range(radius + 1):
        for flips in combinations(range(num_planes), r):
            b = center
            for j in flips:
                b ^= 1 << j
            out.append(b)
    return out


def write_ann_index(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    seed: int = 7,
    dim: int | None = None,
    mode: str = "overwrite",
) -> str:
    """Persist the corpus hive-partitioned by sign-bit LSH bucket — the
    end-to-end ANN layout: one directory per bucket, so a probe query's
    bucket predicate becomes a **PartitionFilter** and the scan never opens
    non-probed buckets' files.  At 100 TB that turns every query from a
    full-corpus scan into |ball|/2^num_planes of the input (≈0.6 % for
    12 planes, radius 2).

    The hyperplanes are regenerated from (dim, num_planes, seed) at query
    time, so the layout is self-describing given those three parameters —
    persist them alongside the index in real deployments."""
    from parquery_spark.sources.parquet import write_partitioned

    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty corpus; pass dim=")
        dim = len(first[0])
    planes = hyperplanes(dim, num_planes, seed)
    bucketed = df.withColumn("bucket", lsh_bucket(vec_col, planes))
    return write_partitioned(bucketed, path, ["bucket"], mode=mode)


def cosine_topk_indexed(
    spark,
    index_path: str,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 12,
    probe_hamming: int = 2,
    seed: int = 7,
    digits: int = 6,
) -> DataFrame:
    """Approximate cosine top-k against a :func:`write_ann_index` layout.

    The probe buckets are enumerated driver-side (:func:`hamming_ball`)
    and applied as ``bucket IN (...)`` — an In predicate on the partition
    column, which Spark turns into directory-level pruning (verify with
    ``.explain``: ``PartitionFilters: [bucket#.. IN (..)]``).  Exact cosine
    then ranks only the surviving ≤ |ball| buckets."""
    planes = hyperplanes(len(query), num_planes, seed)
    qsig = sum(
        (1 << j) for j, p in enumerate(planes) if float(np.dot(p, query)) > 0
    )
    probes = hamming_ball(qsig, num_planes, probe_hamming)
    candidates = spark.read.parquet(index_path).filter(
        F.col("bucket").isin(probes)
    )
    return cosine_topk(candidates, query, k, vec_col, id_col, digits)
