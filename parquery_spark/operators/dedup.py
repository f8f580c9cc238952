"""Deduplication operators for training-data pipelines: exact, fingerprint,
MinHash+LSH, SimHash, and n-gram Jaccard near-dup.

Design for 100 TB:

* **No all-pairs comparison anywhere.**  Every near-dup operator reduces to
  (a) a narrow map computing per-doc signatures (JVM expressions, no UDFs),
  (b) a shuffle keyed on a *bucket* (LSH band, simhash band, or blocking
  key), and (c) pair verification only inside buckets.  Candidate volume is
  controlled by band/row parameters, not data size.
* **Deterministic md5-based hash family.**  ``h_i(s) = int64(md5(s + '#' + i)
  [:15 hex])`` — chosen because both Spark (``conv(substring(md5(..)))``)
  and standard SQL engines can compute it bit-identically, making the
  probabilistic operators differentially testable against a SQL oracle.
  (A production deployment would swap in xxhash64 for speed; the operator
  shape is identical.)
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
    """k-word shingles as strings; empty array when the doc has < k words."""
    w = shingle_tokens(text)
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(
    text: Column | str, num_hashes: int = 16, shingle_k: int = 3
) -> Column:
    """Array of ``num_hashes`` minima over the shingle set — the classic
    MinHash signature; E[fraction of equal positions] = Jaccard."""
    sh = word_shingles(text, shingle_k)

    # NB: the hash seed must be bound via closure, not a defaulted second
    # lambda arg — F.transform passes the ELEMENT INDEX to 2-arg lambdas.
    def hasher(seed):
        return lambda s: hash64(s, seed)

    return F.array(
        *[F.array_min(F.transform(sh, hasher(i))) for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    return df.select(
        F.col(id_col),
        minhash_signature(text_col, num_hashes, shingle_k).alias("sig"),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    max_bucket_size: int = 1000,
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
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k)

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
) -> DataFrame:
    """Exact Jaccard similarity over word (or k-shingle) sets for pairs
    inside the same block.  Blocking keys (e.g. language + length bucket)
    keep the self-join quadratic only within blocks — the standard
    scale-out for exact verification."""
    grams = (
        word_shingles(text_col, shingle_k) if shingle_k > 1
        else shingle_tokens(text_col)
    )
    base = df.select(
        *(block_cols or []), F.col(id_col),
        F.array_distinct(grams).alias("gram_set"),
    )
    a = base.select(
        *(block_cols or []),
        F.col(id_col).alias("id_a"), F.col("gram_set").alias("set_a"),
    )
    b = base.select(
        *(block_cols or []),
        F.col(id_col).alias("id_b"), F.col("gram_set").alias("set_b"),
    )
    joined = (
        a.join(b, block_cols) if block_cols else a.crossJoin(b)
    ).filter(F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("set_a", "set_b")) / F.size(
        F.array_union("set_a", "set_b")
    )
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over word tokens (with multiplicity): bit j is set when the
    sum over tokens of ±1 (sign of token-hash bit j) is positive."""
    hashes = F.transform(shingle_tokens(text), lambda t: hash32(t))

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
    sh = df.select(F.col(id_col), simhash(text_col, bits).alias("sh"))
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
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.select("id_a", "id_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
