"""Deduplication operators for training-data pipelines: exact, fingerprint,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup.

Design for 100 TB:

* **No all-pairs comparison anywhere.**  Every near-dup operator reduces to
  (a) a narrow map computing per-doc signatures (JVM expressions, no UDFs),
  (b) a shuffle keyed on a *bucket* (LSH band, simhash band, or blocking
  key), and (c) pair verification only inside buckets.  Candidate volume is
  controlled by band/row parameters, not data size.
* **Deterministic md5-based hash family.**  Base hash = first 8 hex chars
  of md5 as int64, reduced mod 2^31-1; the MinHash family is the classic
  affine ``h_i(x) = (a_i * x + b_i) mod 2^31-1`` over that base — one md5
  per shingle total.  Chosen because both Spark
  (``conv(substring(md5(..)))``) and standard SQL engines compute it
  bit-identically, making the probabilistic operators differentially
  testable against a SQL oracle.  (A production deployment would swap the
  base for xxhash64 for speed; the operator shape is identical.)
* Skewed buckets (a shingle that appears in every doc) are the classic LSH
  hazard; AQE skew-join handles moderate skew, and ``max_bucket_size``
  drops degenerate buckets outright — standard practice at corpus scale.

The reference has no dedup operators (SURVEY.md §2.4); these are the
beyond-reference pipeline capabilities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from parquery_spark.functions.text import fingerprint, normalized_text
from parquery_spark.operators.util import fan_out

# ---------------------------------------------------------------------------
# shared hash family
# ---------------------------------------------------------------------------

def hash64(c: Column, seed: int | None = None) -> Column:
    """Deterministic 60-bit non-negative hash of a string column via md5.

    Bit-identical to the SQL ``('0x' || substr(md5(s || '#<seed>'), 1, 15))
    ::BIGINT`` so oracle engines can replicate it exactly.
    """
    if seed is not None:
        c = F.concat(c, F.lit(f"#{seed}"))
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash32(c: Column) -> Column:
    """32-bit variant (for per-bit SimHash arithmetic)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


#: Mersenne prime modulus for the affine MinHash family.
MINHASH_P = (1 << 31) - 1


def minhash_coefficients(num_hashes: int, seed: int = 9) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the affine hash family
    ``h_i(x) = (a_i * x + b_i) mod P`` over the base md5 hash.  One md5 per
    shingle + ``num_hashes`` integer transforms — instead of ``num_hashes``
    md5 evaluations — is the classic MinHash construction and ~an order of
    magnitude cheaper.  All operands stay < 2^62, so the arithmetic is
    exact in int64 on any engine (oracle-replicable)."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_P), rng.randrange(0, MINHASH_P))
        for _ in range(num_hashes)
    ]


# ---------------------------------------------------------------------------
# exact + fingerprint dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, subset: list[str], id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact duplicate group (hash group-by —
    one shuffle on the dedup key, map-side partial aggregation)."""
    return (
        df.groupBy(*subset)
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Near-exact dedup on the md5 fingerprint of normalized text
    (case/punctuation/whitespace-insensitive)."""
    return (
        df.select(fingerprint(text_col).alias("fingerprint"), id_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


# ---------------------------------------------------------------------------
# tokens & shingles
# ---------------------------------------------------------------------------

def shingle_tokens(text: Column | str) -> Column:
    """Lowercased word tokens for shingling (empty tokens removed)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(
        F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: t != F.lit("")
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """k-word shingles as strings; empty array when the doc has < k words.

    Built by zipping the token array with its own k-1 shifted copies —
    NOT by ``slice`` inside a ``transform`` lambda: higher-order-function
    lambdas are interpreted per element without subexpression hoisting, so
    an embedded ``slice(tokens, i, k)`` re-evaluates the tokenizer once per
    shingle position (O(n) full-text splits per doc — measured ~10× slower
    at corpus scale).  ``zip_with`` evaluates its collection inputs once
    per row."""
    w = shingle_tokens(text)
    if k == 1:
        return w
    arr = w
    for j in range(1, k):
        # zip_with pads the shorter side with null; concat_ws skips nulls,
        # leaving short partial shingles at the tail — sliced off below
        arr = F.zip_with(
            arr,
            F.slice(w, j + 1, F.greatest(F.size(w) - j, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(
        F.size(w) >= k, F.slice(arr, 1, F.size(w) - k + 1)
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    text: Column | str, num_hashes: int = 16, shingle_k: int = 3
) -> Column:
    """Array of ``num_hashes`` minima over the shingle set — the classic
    MinHash signature; E[fraction of equal positions] = Jaccard.

    Column-expression form for single-row/ad-hoc use.  For corpus-scale
    signature computation use :func:`minhash_signatures`, which plans as
    explode → hash → partial aggregation instead of nested array lambdas
    (Catalyst re-inlines shared lambda subexpressions, so the expression
    form recomputes the shingle array once per hash seed — measured 30×
    slower at corpus scale)."""
    sh = word_shingles(text, shingle_k)
    base = F.transform(sh, lambda s: hash32(s) % F.lit(MINHASH_P))

    # NB: coefficients must be bound via closure, not a defaulted second
    # lambda arg — F.transform passes the ELEMENT INDEX to 2-arg lambdas.
    def affine(a, b):
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P)

    return F.array(
        *[
            F.array_min(F.transform(base, affine(a, b)))
            for a, b in minhash_coefficients(num_hashes)
        ]
    )


def gram_sets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    partition_by_id: bool = True,
) -> DataFrame:
    """One row per doc: ``(id, s = distinct shingles, n = |s|)`` — the
    shared input of signature computation AND exact-Jaccard verification.

    ``partition_by_id`` applies :func:`~parquery_spark.operators.util.
    fan_out` on the raw ``(id, text)`` rows BEFORE shingling: on an
    under-split local corpus (one small parquet file → one task) it
    hash-repartitions on the id so the shingle compute runs on all cores
    AND the downstream ``groupBy(id)`` partial-agg needs no further
    shuffle; on a well-split cluster-scale corpus it is a no-op (no
    gratuitous full-text shuffle).  NOTE: multiple consumers of the
    returned DataFrame each re-execute the shingle pass — Catalyst pushes
    the consumers' differing column renames below the exchange, so
    ReusedExchange never unifies the subtrees.  A caller fanning the sets
    out to several consumers must ``persist()`` (as
    :func:`lsh_verified_pairs` does) or stage them to storage."""
    grams = (
        word_shingles(text_col, shingle_k) if shingle_k > 1
        else shingle_tokens(text_col)
    )
    src = df.select(F.col(id_col), F.col(text_col))
    if partition_by_id:
        src = fan_out(src, id_col)
    return src.select(
        F.col(id_col), F.array_distinct(grams).alias("s")
    ).withColumn("n", F.size("s"))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Corpus-scale MinHash signatures, explode-shaped:

    scan → shingle (once per doc) → explode to (id, shingle) rows → all
    ``num_hashes`` hashes per row (one md5 each) → groupBy(id).min per seed.

    The group-by partial-aggregates map-side, so the shuffle carries one
    ``num_hashes``-wide row per doc per task — not per shingle.  Docs with
    fewer than ``shingle_k`` words have no shingles and are omitted (their
    signature is undefined; the LSH layer treats them as unpairable, which
    matches SQL-oracle NULL-key semantics).

    Pass a precomputed :func:`gram_sets` DataFrame via ``sets`` to share
    the shingle pass with other consumers (MinHash over the distinct set
    equals MinHash over the multiset — min ignores duplicates)."""
    coeffs = minhash_coefficients(num_hashes)
    if sets is None:
        # partition_by_id also fans the shingle/hash compute out to all
        # cores on an under-split corpus; the groupBy(id) below then
        # re-uses that partitioning instead of adding a shuffle
        sets = gram_sets(df, text_col, id_col, shingle_k, partition_by_id=True)
    exploded = sets.select(
        F.col(id_col), F.explode("s").alias("__shingle")
    ).select(
        F.col(id_col),
        (hash32(F.col("__shingle")) % F.lit(MINHASH_P)).alias("__h"),
    )
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min((F.lit(a) * F.col("__h") + F.lit(b)) % F.lit(MINHASH_P)).alias(
                f"__h{i}"
            )
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return mins.select(
        F.col(id_col),
        F.array(*[f"__h{i}" for i in range(num_hashes)]).alias("sig"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
    sets: DataFrame | None = None,
) -> DataFrame:
    """MinHash-LSH candidate pairs with estimated Jaccard.

    Pipeline: signature (narrow map) → explode to ``bands`` band keys →
    self-join on the band key (shuffle on band hash — candidates only, never
    all pairs) → estimate Jaccard from full signatures.  Buckets larger than
    ``max_bucket_size`` are dropped (degenerate content); at corpus scale
    this bounds the worst-case join fan-out.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduplicated across
    bands.
    """
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k, sets=sets)

    banded = sigs.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.element_at("sig", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ])).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "sig", "bk.band", "bk.band_key")

    # drop degenerate buckets before the join
    sized = banded.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")),
    ).filter(F.col("bucket_n") <= max_bucket_size)

    # Both sides of the self-join read `sized`; persist it or the whole
    # shingle → explode → 16-way min-agg → banding → window subtree runs
    # twice (consumer renames are pushed below the exchanges, so
    # ReusedExchange never unifies the sides).  One compact row per
    # (doc, band) — bands × corpus rows, disk-spilling past memory.
    from pyspark import StorageLevel

    sized = sized.persist(StorageLevel.MEMORY_AND_DISK)

    left = sized.select(
        F.col("band"), F.col("band_key"),
        F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
    )
    right = sized.select(
        F.col("band"), F.col("band_key"),
        F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
    )
    pairs = (
        left.join(right, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    n_eq = sum(
        (F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)).cast("int")
        for i in range(num_hashes)
    )
    return pairs.select(
        "id_a", "id_b",
        F.round(n_eq / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_cols: list[str] | None = None,
    threshold: float = 0.5,
    shingle_k: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """Exact Jaccard similarity over word (or k-shingle) sets, computed by
    inverted-index co-occurrence — the scalable exact-verification plan:

    1. one row per (block, doc, distinct gram)  — explode, narrow
    2. self-equi-join on (block, gram)          — pairs sharing ≥1 gram;
       pairs sharing nothing never materialize at all
    3. groupBy(pair).count                      — |A∩B| via partial-agg
    4. join per-doc set sizes back              — |A∪B| = |A|+|B|-|A∩B|

    Compared to an all-pairs block join with per-pair ``array_intersect``,
    this ships only (gram, id) rows through the shuffle — never the gram
    arrays — and its cost is Σ_g df(g)² within blocks, not |block|².
    A pathologically common gram is the skew hazard: AQE skew-join
    splitting handles moderate cases; for adversarial corpora set
    ``max_df`` to drop stop-grams whose within-block document frequency
    exceeds the cap BEFORE the self-join.  The pair-volume contribution of
    a gram is df(g)², so capping bounds step 2 at Σ_g min(df(g), max_df)²
    — a ubiquitous token (df = |corpus|) goes from |corpus|² to zero.
    With ``max_df`` set, ``jaccard`` is computed over the capped
    vocabulary on BOTH sides of the ratio (stop-grams leave the union as
    well as the intersection): the result is exact Jaccard of the
    *informative* grams, the standard stop-word-filtered similarity.
    Only pairs with ``jaccard >= threshold`` (after 6-digit rounding) are
    returned; pairs with zero overlap are definitionally below any
    positive threshold."""
    from pyspark import StorageLevel

    grams = (
        word_shingles(text_col, shingle_k) if shingle_k > 1
        else shingle_tokens(text_col)
    )
    blocks = list(block_cols or [])
    # `base` fans out to the size relation AND both sides of the inverted-
    # index self-join — persist it so the corpus is shingled once, not
    # three times (one array row per doc, the gram_sets shape).
    base = fan_out(
        df.select(*blocks, F.col(id_col), F.col(text_col)), id_col
    ).select(
        *blocks, F.col(id_col), F.array_distinct(grams).alias("gram_set")
    ).withColumn("n_grams", F.size("gram_set")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sizes = base.select(F.col(id_col), F.col("n_grams"))
    exploded = base.select(
        *blocks, F.col(id_col), F.explode("gram_set").alias("g")
    )
    if max_df is not None:
        # document frequency via a window on (block, gram) — partitions
        # exactly like the self-join key, so the exchange is shared with
        # step 2 rather than adding one; per-doc sizes are recomputed over
        # the surviving grams (capped-vocabulary Jaccard, see docstring)
        # the capped index feeds the size recount AND both join sides —
        # persist past the window so the df-count shuffle runs once
        exploded = exploded.withColumn(
            "__df",
            F.count(F.lit(1)).over(Window.partitionBy(*blocks, "g")),
        ).filter(F.col("__df") <= max_df).drop("__df").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sizes = exploded.groupBy(id_col).agg(
            F.count(F.lit(1)).alias("n_grams")
        )
    a = exploded.select(*blocks, F.col(id_col).alias("id_a"), "g")
    b = exploded.select(*blocks, F.col(id_col).alias("id_b"), "g")
    co = (
        a.join(b, [*blocks, "g"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    # sizes is one row per doc — small here, but at corpus scale it is NOT
    # broadcastable; leave the strategy to Catalyst/AQE (it broadcasts when
    # the statistics say it fits)
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n_grams").alias("n_a"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_grams").alias("n_b"))
    jac = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    return (
        co.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _check_simhash_bits(bits: int) -> None:
    """The md5-derived ``hash64`` base supplies 60 usable bits (15 hex
    chars); bits 61-63 would always vote -1, and bits=64 would build
    ``1 << 63`` which overflows Spark LongType."""
    if not 1 <= bits <= 60:
        raise ValueError(
            f"simhash bits must be in [1, 60] (got {bits}): the md5-derived "
            "64-bit hash base provides 60 usable bits"
        )


def simhash_table(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """Corpus-scale SimHash, explode-shaped: one md5 per token (explode →
    hash32 once), then ``bits`` partial-aggregated sign-votes per doc —
    instead of the expression form's per-bit re-traversal of the token
    array.  Docs with zero tokens get simhash 0 (rejoined, matching the
    SQL convention that an empty vote sum sets no bits)."""
    _check_simhash_bits(bits)
    token_hash = hash32 if bits <= 32 else hash64
    src = fan_out(df.select(F.col(id_col), F.col(text_col)), id_col)
    exploded = src.select(
        F.col(id_col), F.explode(shingle_tokens(text_col)).alias("__t")
    ).select(F.col(id_col), token_hash(F.col("__t")).alias("__h"))

    # Lane-packed vote counting: 3 bit-positions share one 64-bit
    # accumulator in 21-bit lanes, so a 60-bit simhash needs 20 partial-agg
    # sums instead of 60 (measured ~30% faster warm, ~3× faster on first
    # compile — the generated aggregate class is a third the size).
    # bit j = 3·m + l accumulates ones_j in lane l of accumulator m;
    # vote_j = 2·ones_j − n, so bit j is set iff 2·ones_j > n.  Exact for
    # per-doc token counts < 2^21 (≈2M tokens — chunk larger documents
    # upstream, the standard training-pipeline contract).
    lanes = 3
    n_acc = (bits + lanes - 1) // lanes

    def acc_expr(m: int) -> Column:
        e = F.shiftright("__h", lanes * m).bitwiseAND(F.lit(1))
        for l in range(1, min(lanes, bits - lanes * m)):
            e = e + F.shiftleft(
                F.shiftright("__h", lanes * m + l).bitwiseAND(F.lit(1)), 21 * l
            )
        return e.cast("long")

    votes = exploded.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(acc_expr(m)).alias(f"__a{m}") for m in range(n_acc)],
    )

    def ones(j: int) -> Column:
        m, l = divmod(j, lanes)
        return F.shiftright(f"__a{m}", 21 * l).bitwiseAND(F.lit(0x1FFFFF))

    sh = sum(
        F.when(ones(j) * 2 > F.col("__n"), F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for j in range(bits)
    )
    hashed = votes.select(F.col(id_col), sh.alias("sh"))
    return (
        df.select(id_col)
        .join(hashed, id_col, "left")
        .select(F.col(id_col), F.coalesce("sh", F.lit(0).cast("long")).alias("sh"))
    )


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over word tokens (with multiplicity): bit j is set when the
    sum over tokens of ±1 (sign of token-hash bit j) is positive.

    Column-expression form for ad-hoc use; at corpus scale prefer
    :func:`simhash_table` (explode-shaped — the expression form re-walks
    the token array once per bit)."""
    _check_simhash_bits(bits)
    hashes = F.transform(
        shingle_tokens(text), hash32 if bits <= 32 else hash64
    )

    def voter(bit):
        return lambda acc, h: acc + (
            F.shiftright(h, bit).bitwiseAND(F.lit(1)) * 2 - 1
        )

    out = F.lit(0).cast("long")
    for j in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), voter(j))
        out = out + F.when(vote > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def simhash_candidates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup candidates: band the ``bits``-bit hash into
    ``bands`` chunks (pigeonhole: hamming ≤ bands-1 ⇒ some band equal),
    join on (band, chunk), verify hamming distance ≤ ``max_hamming``."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    # The banded table feeds BOTH sides of the self-join; without a
    # materialization boundary Spark computes the whole tokenize + 60-vote
    # aggregation subtree once per consumer (ReusedExchange never unifies
    # the two renamed sides).  The signature relation is one (id, long) row
    # per doc — persisting it is the stage-to-storage pattern, ~16 bytes/doc
    # at any corpus scale, spilling to disk past executor memory.
    from pyspark import StorageLevel

    sh = simhash_table(df, text_col, id_col, bits).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    banded = sh.select(
        id_col, "sh",
        F.explode(F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright("sh", b * band_bits).bitwiseAND(F.lit(mask)).alias("chunk"),
            ) for b in range(bands)
        ])).alias("bk"),
    ).select(id_col, "sh", "bk.band", "bk.chunk")
    a = banded.select("band", "chunk", F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = banded.select("band", "chunk", F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.join(b, ["band", "chunk"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("long")
    return (
        pairs.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 15,
    bands: int = 5,
    shingle_k: int = 2,
    threshold: float = 0.5,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Two-stage near-dup detection — the corpus-scale production pattern:

    1. **recall stage**: MinHash-LSH candidate generation
       (:func:`lsh_candidate_pairs`) — cost scales with band collisions,
       never with |corpus|².
    2. **precision stage**: exact Jaccard verification of the candidates
       only — per-pair set intersection is affordable because the
       candidate set is orders of magnitude smaller than all pairs.

    The distinct-shingle sets are computed ONCE (:func:`gram_sets`) and
    **persisted** (MEMORY_AND_DISK, one compact row per doc): the signature
    pass and both sides of the verification join all read the cached sets,
    so the corpus is shingled exactly once, not three times.  At cluster
    scale this is the stage-to-storage pattern — the per-doc set relation
    is a few KB/doc and spills to disk if it outgrows executor memory.
    (Exchange reuse cannot do this implicitly: each consumer's column
    renames get pushed below the repartition, so the exchange subtrees are
    not canonically identical and ReusedExchange never fires.)

    Returns (id_a, id_b, jaccard) for candidates whose exact Jaccard (over
    distinct ``shingle_k``-word shingles, rounded to 6 digits) meets the
    threshold.  Recall is governed by the banding: P(candidate) =
    1-(1-j^rows)^bands.
    """
    from pyspark import StorageLevel

    sets = gram_sets(df, text_col, id_col, shingle_k, partition_by_id=True)
    sets = sets.persist(StorageLevel.MEMORY_AND_DISK)
    cands = lsh_candidate_pairs(
        df, text_col, id_col,
        num_hashes=num_hashes, bands=bands, shingle_k=shingle_k,
        max_bucket_size=max_bucket_size, sets=sets,
    ).select("id_a", "id_b")
    sa = sets.select(F.col(id_col).alias("id_a"), F.col("s").alias("s_a"),
                     F.col("n").alias("n_a"))
    sb = sets.select(F.col(id_col).alias("id_b"), F.col("s").alias("s_b"),
                     F.col("n").alias("n_b"))
    inter = F.size(F.array_intersect("s_a", "s_b"))
    jac = inter / (F.col("n_a") + F.col("n_b") - inter)
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def lsh_join(
    new_df: DataFrame,
    corpus_df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """INCREMENTAL dedup: MinHash-LSH candidate pairs between a NEW batch
    and the EXISTING corpus (never within either side) — the ingest-time
    shape: each arriving batch is checked against the accumulated corpus
    without ever rebuilding a corpus×corpus self-join.

    Both sides band independently (a doc's band keys depend only on its
    own signature); the join is band-key equi, with the degenerate-bucket
    cap applied to the CORPUS side — that bounds fan-out per band key by
    ``max_bucket_size`` regardless of corpus size.  At scale the corpus
    side's banded signatures are a persisted index (band_key-partitioned
    parquet), so each batch join prunes to matching buckets.

    Returns ``(new_id, corpus_id, est_jaccard)``.
    """
    from pyspark import StorageLevel

    def banded(df):
        return band_keys(df, text_col, id_col, num_hashes, bands, shingle_k)

    left = banded(new_df).select(
        F.col("band"), F.col("band_key"),
        F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a"),
    )
    right = (
        banded(corpus_df)
        .withColumn(
            "bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")),
        )
        .filter(F.col("bucket_n") <= max_bucket_size)
        .select(
            F.col("band"), F.col("band_key"),
            F.col(id_col).alias("corpus_id"), F.col("sig").alias("sig_b"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pairs = (
        left.join(right, ["band", "band_key"])
        .select("new_id", "corpus_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    n_eq = sum(
        (F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)).cast("int")
        for i in range(num_hashes)
    )
    return pairs.select(
        "new_id", "corpus_id",
        F.round(n_eq / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
    )


def band_keys(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash band keys: ``(id, sig, band, band_key)`` — one row per
    (document, band).  A document's band keys depend only on its own
    signature, so each side of an incremental join bands independently,
    and a corpus's banded rows can be PERSISTED once (see
    :func:`write_minhash_index`) instead of recomputed per batch."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)
    return sigs.select(
        id_col,
        "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.md5(F.concat_ws(",", *[
                        F.element_at("sig", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ])).alias("band_key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "sig", "bk.band", "bk.band_key")


# ---------------------------------------------------------------------------
# Persisted MinHash band-key index: hive layout partitioned by
# (band, band_key prefix) — the at-scale corpus side of incremental dedup
# ---------------------------------------------------------------------------

#: hex chars of the band_key used as the partition directory key: 2 chars =
#: 256 directories per band — coarse enough that a corpus write doesn't
#: explode into millions of tiny files, fine enough that a small arriving
#: batch prunes ~99% of the index (its probe set covers few prefixes).
BAND_PREFIX_CHARS = 2


def write_minhash_index(
    corpus_df: DataFrame,
    path: str,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    mode: str = "overwrite",
) -> str:
    """Persist the corpus's banded MinHash signatures hive-partitioned by
    ``(band, bk_prefix)`` — the ingest-time layout :func:`lsh_join`'s
    docstring promises: each arriving batch re-bands only ITSELF, reads
    only matching index directories (PartitionFilters — verify with
    ``.explain``), and never re-minhashes the accumulated corpus.

    ``band_key`` itself stays a data column (equi-join key); only its
    2-hex-char prefix becomes a directory, keeping the file count bounded
    (bands × 256) while the directory filter still prunes I/O.  Append new
    batches with ``mode="append"`` after they pass dedup — the layout is
    stable because a row's partition depends only on its own signature."""
    from parquery_spark.sources.parquet import write_partitioned

    bk = band_keys(corpus_df, text_col, id_col, num_hashes, bands, shingle_k)
    bk = bk.withColumn(
        "bk_prefix", F.substring("band_key", 1, BAND_PREFIX_CHARS)
    )
    # co-locate each output directory's rows in one task before the write:
    # without this every task holding any row of a directory opens a file
    # there — up to tasks × (bands × 256) tiny files, and the probe then
    # pays per-file open costs that dwarf the data (measured 6× on the
    # probe, ~10× on the write)
    bk = bk.repartition("band", "bk_prefix")
    return write_partitioned(bk, path, ["band", "bk_prefix"], mode=mode)


def lsh_join_indexed(
    spark,
    index_path: str,
    new_df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Incremental dedup against a :func:`write_minhash_index` layout:
    band the arriving batch, prune the index read to the batch's
    ``(band, bk_prefix)`` directories, equi-join on the full band key.

    The probe set is enumerated driver-side from the batch's band keys
    (distinct ``(band, prefix)`` pairs — bounded by bands × 256 rows, a
    scalar-sized collect like any dynamic partition pruning), then applied
    as a disjunction over the two partition columns so the scan never
    opens non-matching directories.  The degenerate-bucket cap applies to
    full ``(band, band_key)`` buckets; pruning keeps buckets whole (every
    row of a band_key shares its prefix), so capped counts are identical
    to the unindexed :func:`lsh_join`.

    Returns ``(new_id, corpus_id, est_jaccard)`` — same contract and same
    results as :func:`lsh_join` with the same parameters."""
    from pyspark import StorageLevel

    left = band_keys(
        new_df, text_col, id_col, num_hashes, bands, shingle_k
    ).withColumn(
        "bk_prefix", F.substring("band_key", 1, BAND_PREFIX_CHARS)
    ).persist(StorageLevel.MEMORY_AND_DISK)

    by_band: dict[int, set[str]] = {}
    for r in left.select("band", "bk_prefix").distinct().collect():
        by_band.setdefault(r["band"], set()).add(r["bk_prefix"])
    # one IN-list per band (flat, ≤ bands OR terms) — a per-(band,prefix)
    # OR chain would nest one node per pair and overflow the expression
    # converter for realistic probe sets
    pred = None
    for band, prefixes in sorted(by_band.items()):
        clause = (F.col("band") == band) & F.col("bk_prefix").isin(
            sorted(prefixes)
        )
        pred = clause if pred is None else (pred | clause)

    from parquery_spark.operators.util import index_relation

    index = index_relation(spark, index_path)
    if pred is not None:
        index = index.filter(pred)
    right = (
        index.withColumn(
            "bucket_n",
            F.count(F.lit(1)).over(Window.partitionBy("band", "band_key")),
        )
        .filter(F.col("bucket_n") <= max_bucket_size)
        .select(
            "band", "band_key",
            F.col(id_col).alias("corpus_id"), F.col("sig").alias("sig_b"),
        )
    )
    pairs = (
        left.select(
            "band", "band_key",
            F.col(id_col).alias("new_id"), F.col("sig").alias("sig_a"),
        )
        .join(right, ["band", "band_key"])
        .select("new_id", "corpus_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "corpus_id"])
    )
    n_eq = sum(
        (F.element_at("sig_a", i + 1) == F.element_at("sig_b", i + 1)).cast("int")
        for i in range(num_hashes)
    )
    return pairs.select(
        "new_id", "corpus_id",
        F.round(n_eq / F.lit(float(num_hashes)), 6).alias("est_jaccard"),
    )

def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    left_id: str,
    right_id: str,
) -> DataFrame:
    """Edit-distance-1 entity matching WITHOUT an all-pairs comparison:
    symmetric-delete blocking (the SymSpell construction).  Each string
    emits ``len + 1`` block keys — itself plus every one-character
    deletion; two strings within Levenshtein distance 1 ALWAYS share a
    key (a substitution pair meets at the deletion of the edited
    position, an insert/delete pair at the inserted position's deletion),
    so the equi-join on the key has perfect recall and only its
    candidates pay Levenshtein verification.

    Explode-shaped (posexplode over a ``sequence``, substring surgery in
    codegen — no interpreted higher-order lambdas); the shuffle key is
    the deletion variant, whose collisions are near-identical strings by
    construction.  Returns ``(left_id, right_id, distance)`` with
    ``distance <= 1``."""

    def keyed(df, col, id_col, out_id):
        # single-file inputs scan as one split; the explode multiplies
        # rows ~len(s)-fold, so spread BEFORE it or one task pays it all
        df = fan_out(df, id_col)
        c = F.col(col)
        ex = df.select(
            F.col(id_col).alias(out_id),
            c.alias(f"__s_{out_id}"),
            F.explode(F.sequence(F.lit(0), F.length(c))).alias("__i"),
        )
        s = f"__s_{out_id}"
        key = F.when(F.col("__i") == 0, F.col(s)).otherwise(
            F.expr(
                f"concat(substring({s}, 1, __i - 1),"
                f" substring({s}, __i + 1, length({s})))"
            )
        )
        return ex.select(out_id, s, key.alias("__k"))

    l = keyed(left, left_col, left_id, "__lid")
    r = keyed(right, right_col, right_id, "__rid")
    cands = l.join(r, "__k").dropDuplicates(["__lid", "__rid"])
    dist = F.levenshtein("__s___lid", "__s___rid")
    return (
        cands.select(
            F.col("__lid").alias(left_id),
            F.col("__rid").alias(right_id),
            dist.cast("long").alias("distance"),
        )
        .filter(F.col("distance") <= 1)
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    rolling-hash scheme): hash every k-word gram positionally, slide a
    w-gram window, keep the minimum hash of each window, return the
    DISTINCT selected hashes per document.  Guarantees any shared run of
    k + w - 1 words between two documents shares at least one fingerprint,
    while storing ~1/w of the gram hashes.

    Distributed shape: posexplode (narrow) → one shuffle on id_col for the
    rolling-min window → distinct on (id, hash).  Never materializes
    all-pairs anything; the fingerprint relation is the join key for
    plagiarism/overlap detection downstream.

    Returns (id_col, fingerprint) rows; docs with fewer than k + w - 1
    words yield no rows (no complete window exists).
    """
    from pyspark.sql import Window

    grams = word_shingles(text_col, k)
    pos = df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "gram")
    ).select(id_col, "pos", hash64(F.col("gram")).alias("h"))
    wroll = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    wdoc = Window.partitionBy(id_col)
    sel = pos.select(
        id_col,
        "pos",
        F.min("h").over(wroll).alias("fingerprint"),
        F.count(F.lit(1)).over(wdoc).alias("__ng"),
    )
    return (
        sel.where(F.col("pos") <= F.col("__ng") - w)
        .select(id_col, "fingerprint")
        .distinct()
    )


def substring_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    max_gram_occ: int = 64,
) -> DataFrame:
    """Exact-substring duplicate spans (the ExactSubstr family of
    "Deduplicating Training Data Makes Language Models Better", Lee et al.
    2022): find every maximal run of >= ``min_tokens`` consecutive words
    shared verbatim between two documents, with its position in BOTH docs
    — the artifact you need to *cut* duplicated text, not merely flag the
    document (which MinHash/SimHash/winnowing already do).

    Suffix arrays don't distribute; the equivalent join-shaped plan does:

    1. posexplode each doc into its ``min_tokens``-word grams (narrow);
    2. drop grams occurring once (no partner) or more than
       ``max_gram_occ`` times (boilerplate stop-grams — the hot keys that
       would otherwise quadratically blow the bucket join, same cap role
       as ``max_bucket_size`` in ``lsh_candidate_pairs``);
    3. self-equi-join on the gram (shuffle on the gram key; per-key
       fan-out <= max_gram_occ**2 by construction);
    4. merge hits into maximal spans: matches of one shared run all lie
       on one diagonal (pos_a - pos_b constant) at consecutive pos_a, so
       ``pos_a - row_number()`` over (pair, diagonal) is constant exactly
       within a maximal run (the classic gaps-and-islands key) — one
       shuffle on (doc_a, doc_b), then a plain groupBy.

    At 100 TB the only with-n driver/executor term is the per-gram-key
    bucket, capped by ``max_gram_occ``; everything else is narrow or
    key-partitioned.  (For petabyte shuffles, swap the join key for
    ``xxhash64(gram)`` and keep the gram equality as a residual — halves
    shuffle bytes at zero semantic cost; kept as the raw string here so
    the DuckDB oracle twin is textually identical.)

    Returns one row per maximal span:
    ``(doc_a, doc_b, a_start, b_start, span_tokens)`` with doc_a < doc_b,
    1-based token offsets, span_tokens >= min_tokens.
    """
    from pyspark.sql import Window

    L = int(min_tokens)
    if L < 2:
        raise ValueError("min_tokens must be >= 2")
    toks = fan_out(
        df.select(F.col(id_col).alias("__id"), F.col(text_col)), "__id"
    ).select(
        "__id", F.split(F.col(text_col), " ").alias("__t")
    ).where(F.size("__t") >= L)
    # sequence() counts DOWN when start > stop (NOTES.md hazard) — the
    # size filter above guarantees 1 <= size - L + 1
    grams = toks.select(
        "__id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("__t") - L + 1),
                lambda p: F.concat_ws(" ", F.slice("__t", p, L)),
            )
        ).alias("__p0", "gram"),
    ).select("__id", (F.col("__p0") + 1).alias("pos"), "gram")
    # occurrence-count via window (one shuffle on the gram key) instead
    # of groupBy + join-back: same filter semantics, one fewer gram
    # derivation.  Both self-join sides read `occ`; persist it or the
    # tokenize → explode → window subtree runs twice (same hazard and
    # same fix as ``lsh_candidate_pairs``'s `sized`).  The window's
    # hashpartitioning(gram) survives the persist, so the self-join
    # adds no further exchange.
    from pyspark import StorageLevel

    occ = (
        grams.withColumn(
            "__n", F.count(F.lit(1)).over(Window.partitionBy("gram"))
        )
        .where((F.col("__n") >= 2) & (F.col("__n") <= max_gram_occ))
        .drop("__n")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    a = occ.select(
        F.col("gram"),
        F.col("__id").alias("doc_a"),
        F.col("pos").alias("pos_a"),
    )
    b = occ.select(
        F.col("gram").alias("__gb"),
        F.col("__id").alias("doc_b"),
        F.col("pos").alias("pos_b"),
    )
    hits = a.join(
        b, (a["gram"] == b["__gb"]) & (a["doc_a"] < b["doc_b"])
    ).select("doc_a", "doc_b", "pos_a", "pos_b")
    diag = F.col("pos_a") - F.col("pos_b")
    w = Window.partitionBy("doc_a", "doc_b", diag).orderBy("pos_a")
    isl = hits.select(
        "doc_a",
        "doc_b",
        "pos_a",
        "pos_b",
        diag.alias("__diag"),
        (F.col("pos_a") - F.row_number().over(w)).alias("__island"),
    )
    return (
        isl.groupBy("doc_a", "doc_b", "__diag", "__island")
        .agg(
            F.min("pos_a").cast("int").alias("a_start"),
            F.min("pos_b").cast("int").alias("b_start"),
            (F.max("pos_a") - F.min("pos_a") + L).cast("int").alias(
                "span_tokens"
            ),
        )
        .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    )


def substring_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 8,
    max_gram_occ: int = 64,
) -> DataFrame:
    """Per-document removal accounting for exact-substring dedup: take
    every span ``substring_spans`` found, cut it from the LATER document
    of each pair (keep-first convention: doc_a < doc_b, so doc_b loses
    the span), merge the possibly-overlapping cut intervals per document
    (one doc can duplicate many partners), and report how many tokens
    the cut removes vs keeps.  ``kept_tokens = 0`` marks a verbatim
    subset of an earlier doc — droppable outright.

    The interval merge is the standard gaps-and-islands running-max:
    after the span shuffle (keyed by doc), everything is one window pass
    and a groupBy per doc — no join back to the pair space.  Output is
    one row per AFFECTED document:
    ``(doc_id, n_tokens, removed_tokens, kept_tokens, n_cut_spans)``.
    """
    from pyspark.sql import Window

    spans = substring_spans(
        df, text_col, id_col,
        min_tokens=min_tokens, max_gram_occ=max_gram_occ,
    )
    ivals = spans.select(
        F.col("doc_b").alias("__doc"),
        F.col("b_start").cast("long").alias("s"),
        (F.col("b_start") + F.col("span_tokens") - 1).cast("long").alias(
            "e"
        ),
    )
    wprev = (
        Window.partitionBy("__doc")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wrun = Window.partitionBy("__doc").orderBy("s", "e")
    marked = ivals.withColumn(
        "__new",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(wprev), F.lit(-1)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__isl", F.sum("__new").over(wrun))
    merged = (
        marked.groupBy("__doc", "__isl")
        .agg(F.min("s").alias("ms"), F.max("e").alias("me"))
        .groupBy("__doc")
        .agg(
            F.sum(F.col("me") - F.col("ms") + 1).alias("removed_tokens"),
            F.count(F.lit(1)).alias("n_cut_spans"),
        )
    )
    lens = df.select(
        F.col(id_col).alias("__doc"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias(
            "n_tokens"
        ),
    )
    return (
        merged.join(lens, "__doc")
        .select(
            F.col("__doc").alias(id_col),
            "n_tokens",
            F.col("removed_tokens").cast("long").alias("removed_tokens"),
            (F.col("n_tokens") - F.col("removed_tokens"))
            .cast("long")
            .alias("kept_tokens"),
            F.col("n_cut_spans").cast("long").alias("n_cut_spans"),
        )
    )
