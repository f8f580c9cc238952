"""Distributed connected components — near-duplicate CLUSTER assignment.

Candidate-pair generators (MinHash-LSH, SimHash, embedding near-dup) emit
EDGES; production dedup needs the transitive closure: every document labeled
with a canonical cluster id so one representative per cluster survives.

Algorithm: iterated **hash-to-min** label propagation (the dataflow variant
of Kiveris et al.'s star-contraction family):

* ``label(v)`` starts as ``v``;
* each round every vertex takes the min of its own and its neighbors'
  labels (edges join labels → groupBy(vertex).min — two shuffles/round,
  both partial-aggregated map-side);
* converged when no label changes.

Rounds needed ≈ O(log(diameter)).  Near-dup clusters are dense and shallow
(diameter 2-4 in practice), so 3-5 rounds close almost any corpus; a chain
of pairwise-similar documents is the worst case, bounded by ``max_iter``.

Scale properties (the 100 TB contract):

* state per round is one ``(vertex, label)`` row per vertex — 16 bytes; the
  edge list is read repeatedly but never mutated (persisted once).
* every round's lineage is truncated with ``localCheckpoint`` — without it
  the logical plan doubles per iteration and the driver's analysis time
  explodes long before the data does.  (On a cluster with dynamic
  allocation, configure a reliable ``checkpoint`` dir instead; executor
  loss discards localCheckpoint blocks.)
* the convergence test is one aggregated count per round — a scalar to the
  driver, not a collect.

The reference has no graph operators (SURVEY.md §2.4 — single-table OLAP
only); this is part of the beyond-reference training-pipeline surface.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StructField, StructType


#: pair sets at or under this size resolve by driver-side union-find;
#: above it the distributed label-propagation loop runs.  LSH band caps
#: bound candidate volume independent of corpus size, so real dedup
#: graphs sit far below this at any SF.
_DRIVER_CC_MAX_PAIRS = 200_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve an edge list to ``(v, cluster_id)`` — cluster id is the
    minimum vertex id reachable from ``v`` (a canonical, deterministic
    representative).  Only vertices that appear in ``pairs`` are returned;
    singletons are their own cluster (splice them with a left join, as
    :func:`dedup_clusters` does).

    Raises ``RuntimeError`` if ``max_iter`` rounds don't converge — that
    means a pathological similarity chain, and silently returning
    half-merged clusters would corrupt the dedup downstream.

    Round 12 (guide §1.2 — fix the algorithm before the stages): a pair
    set that fits on the driver resolves by union-find in microseconds,
    so up to :data:`_DRIVER_CC_MAX_PAIRS` edges the closure is computed
    locally and returned as a small local relation (downstream joins
    against it broadcast).  A bounded-candidate dedup — which is what
    every LSH band-cap produces, at any corpus size — lives under this
    ceiling by construction; only an unbounded pair graph pays the
    distributed label-propagation loop (2 job waves per round).  The
    limit+collect probe is the size gate: ``limit(N+1)`` either proves
    the set small (and IS the edge list) or costs one truncated scan.
    """
    edges_head = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    ).limit(_DRIVER_CC_MAX_PAIRS + 1).collect()
    if len(edges_head) <= _DRIVER_CC_MAX_PAIRS:
        spark = pairs.sparkSession
        vtype = pairs.schema[id_a].dataType
        parent: dict = {}

        def find(x):
            r = x
            while parent[r] is not r and parent[r] != r:
                r = parent[r]
            while parent[x] is not r and parent[x] != r:
                parent[x], x = r, parent[x]
            return r

        for row in edges_head:
            a, b = row["src"], row["dst"]
            if a is None or b is None:
                continue
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[rb] = ra
        mins: dict = {}
        for v in parent:
            r = find(v)
            m = mins.get(r)
            mins[r] = v if m is None or v < m else m
        rows = [(v, mins[find(v)]) for v in sorted(parent)]
        out_schema = StructType(
            [
                StructField("v", vtype, True),
                StructField("cluster_id", vtype, True),
            ]
        )
        return spark.createDataFrame(rows, out_schema)

    edges = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    # undirected: keep both orientations so one join per round sees every
    # neighbor; self-loops are harmless (min(label, own label) is a no-op).
    # Pre-partitioned on the join key (dst): the persisted partitioning
    # satisfies the join's distribution requirement every round, so only
    # the (small) label relation shuffles per iteration — the edge list,
    # the big side, never moves again.
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .repartition(F.col("dst"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    labels = (
        edges.select(F.col("src").alias("v"))
        .distinct()
        .select(F.col("v"), F.col("v").alias("lbl"))
        .localCheckpoint()
    )

    if labels.isEmpty():
        edges.unpersist(blocking=False)
        return labels.select(F.col("v"), F.col("lbl").alias("cluster_id"))

    # Convergence test, two shapes by id type.  Numeric ids: labels are
    # per-vertex MONOTONE NON-INCREASING, so the label total strictly
    # decreases iff any label changed — one scalar aggregate per round.
    # DECIMAL(38,0) keeps the total exact (a wrapped BIGINT sum could
    # alias two different states).  Non-numeric ids (string doc ids): the
    # decimal cast would yield NULL and the sum test would "converge" on
    # round one with half-merged clusters — use an exact changed-label
    # count instead (join previous vs new on v; both sides are the
    # checkpointed one-row-per-vertex relations, co-partitioned by the
    # groupBy, so the join is cheap relative to the propagation join).
    numeric = isinstance(labels.schema["lbl"].dataType, NumericType)
    prev_total = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges["dst"] == labels["v"])
            .select(F.col("src").alias("v"), F.col("lbl"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("v")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
        if numeric:
            total = new_labels.agg(
                F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
            ).first()["s"]
            converged = total == prev_total and prev_total is not None
            prev_total = total
        else:
            converged = (
                new_labels.alias("n")
                .join(labels.alias("p"), "v")
                .where(F.col("n.lbl") != F.col("p.lbl"))
                .isEmpty()
            )
        labels = new_labels
        if converged:
            edges.unpersist(blocking=False)
            return labels.select(F.col("v"), F.col("lbl").alias("cluster_id"))

    edges.unpersist(blocking=False)
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "pathological similarity chain; raise max_iter or pre-partition "
        "the candidate graph"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Every document labeled with its near-dup cluster: transitive closure
    over ``pairs``, singletons as their own cluster, plus the cluster size
    and a ``is_kept`` flag for the canonical representative (the minimum
    id — deterministic, so re-runs keep the same survivors).

    Output: ``(id_col, cluster_id, cluster_size, is_kept)``.
    """
    cc = connected_components(pairs, id_a, id_b, max_iter)
    ids = docs.select(F.col(id_col))
    labeled = (
        ids.join(cc, ids[id_col] == cc["v"], "left")
        .select(
            F.col(id_col),
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        )
    )
    sized = labeled.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return (
        labeled.join(sized, "cluster_id")
        .select(
            F.col(id_col),
            F.col("cluster_id"),
            F.col("cluster_size"),
            (F.col(id_col) == F.col("cluster_id")).alias("is_kept"),
        )
    )


def triangle_stats(
    edges: DataFrame,
    broadcast_max_edges: int = 5_000_000,
    materialize: bool = True,
) -> DataFrame:
    """Triangle count + wedge count + global clustering coefficient for
    an undirected simple graph given as (u, v) edge rows with u < v
    (deduplicated).

    Degree orientation: every edge is directed from its lower-(degree,
    id) endpoint, so each triangle is generated exactly once and the
    wedge join's per-vertex fan-out is bounded by out-degree <=
    sqrt(2m) — join volume near m^1.5 instead of sum(d^2) on power-law
    graphs.  The closing (s, t) edge set packs into one int64 (requires
    vertex ids < 2^31); while the edge count is at most
    ``broadcast_max_edges`` (~5M packed longs ≈ 40 MB serialized) it is
    broadcast, so the wedge stream — the big intermediate — is consumed
    map-side and never shuffles.  Above the cap the hint is DROPPED and
    the closing join runs as an ordinary shuffle join on the packed key
    (same semantics) — a hardcoded hint on an oversized relation would
    OOM the executors instead of degrading.  The gate uses the EXACT
    edge count (one count job against the just-persisted edge relation —
    the same cache every downstream branch reads anyway): an optimizer
    byte estimate over a compressed parquet scan can undercount rows
    several-fold and broadcast exactly the oversized relation this gate
    exists to keep off the executors' heaps.
    """
    from pyspark.sql import functions as F

    edges = edges.select("u", "v").persist()
    m_est = edges.count()
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .persist()
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    # round-13 measured-and-REJECTED: broadcasting deg for the two
    # orientation lookups (the same size class as the closing set).
    # Alternating A/B min-of-7 at sf0.1: shuffle joins 2.06 s vs
    # broadcast 2.70 s end-to-end — the broadcast-build jobs (driver
    # collect + hash relation per lookup) cost more than the 32-way
    # shuffle of the 1.2M-edge relation they replace, and deg must
    # materialize for the build anyway.  Kept as shuffle joins.
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        edges.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        )
        .persist()
    )
    e2 = oriented.select(F.col("s").alias("t"), F.col("t").alias("w"))
    pack = (F.col("s").cast("long") * F.lit(4294967296)) + F.col("t")
    # under the broadcast cap BOTH the wedge join's probe-side copy of
    # the oriented edges and the closing edge set are broadcast (round
    # 12, guide §2.4/§3.1): the wedge stream — the m^1.5 intermediate —
    # is then both GENERATED and CLOSED map-side over the persisted
    # oriented relation, one stage, zero exchanges (the former shape
    # sort-merge-joined oriented with itself: two exchanges plus two
    # sorts of the full edge relation).  Above the cap both joins
    # degrade to ordinary shuffle joins, same semantics.
    if m_est <= broadcast_max_edges:
        e2 = F.broadcast(e2)
    wedges = oriented.join(e2, "t").select(
        (
            (F.col("s").cast("long") * F.lit(4294967296)) + F.col("w")
        ).alias("st")
    )
    closing = oriented.select(pack.alias("st"))
    if m_est <= broadcast_max_edges:
        closing = F.broadcast(closing)
    tri = wedges.join(closing, "st").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    n_wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).alias(
            "n_wedges"
        )
    )
    # n_edges IS m_est — the count this function already ran to gate the
    # broadcasts; re-aggregating the persisted relation bought a third
    # one-row subtree plus its broadcast exchange (round 12, guide §1.2
    # "don't compute things you throw away")
    summary = (
        tri.crossJoin(F.broadcast(n_wedges))
        .select(
            F.lit(m_est).cast("long").alias("n_edges"),
            "n_wedges",
            "n_triangles",
            F.round(
                3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("clustering_coeff"),
        )
    )
    if not materialize:
        # lazy plan for inspection (plan-shape tests): the caller owns
        # the release of the three persisted relations —
        # ``spark.catalog.clearCache()`` or collect-then-unpersist
        return summary
    # OWNER-RELEASE: the result is a one-row scalar summary, so compute
    # it here while the iteration caches are live, release every persist,
    # and hand back the materialized row — the CacheManager stays flat
    # after return (the former shape returned a plan over the persisted
    # relations, leaking three session-lived caches per call)
    rows = summary.collect()
    schema = summary.schema
    for cached in (edges, deg, oriented):
        cached.unpersist()
    return edges.sparkSession.createDataFrame(rows, schema)
