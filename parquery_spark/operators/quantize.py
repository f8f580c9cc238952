"""Embedding compression: per-vector int8 scalar quantization.

A 100 TB embedding corpus at float32 is 4 bytes/dim; int8 scalar
quantization cuts storage and ANN-scan bandwidth 4x at a bounded,
measurable reconstruction error — the standard first rung of the
vector-compression ladder (below it: product quantization over k-means
codebooks, see ``operators/ivf.py`` for the coarse quantizer this
composes with).

Everything here is pure Column expressions over higher-order functions
(``transform`` / ``aggregate``) — elementwise work stays JVM-side, no
Python in the row path, and the operator is a narrow map: zero
shuffles, so it scales with scan bandwidth alone.

Determinism contract (what the q208 oracle leans on): every arithmetic
step is explicitly cast to DOUBLE and written in the same textual shape
as the oracle SQL, so both engines execute identical IEEE-754 double
ops; ``floor(x + 0.5)`` half-up lands on exactly-representable values
at the range endpoints (0.5 and 255.5), so codes are bit-stable
cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    codes_col: str = "codes",
    err_col: str = "max_abs_err",
) -> DataFrame:
    """Append per-vector int8 codes and max reconstruction error.

    Per vector: ``mn/mx`` = min/max component, ``code_i =
    floor((x_i - mn) / (mx - mn) * 255 + 0.5)`` (0..255, stored long —
    the int8 payload plus the two float scale params), and
    ``max_abs_err`` = max_i |dequant(code_i) - x_i|, the worst-case
    per-component distortion (≤ (mx - mn) / 510 + rounding).

    Degenerate constant vectors (mx == mn) quantize to all-zero codes
    with zero error instead of dividing by zero.
    """
    mn = F.array_min(vec_col).cast("double")
    mx = F.array_max(vec_col).cast("double")
    out = df.withColumn("__mn", mn).withColumn("__mx", mx)
    rng = F.col("__mx") - F.col("__mn")
    codes = F.when(
        rng > 0,
        F.transform(
            vec_col,
            lambda x: F.floor(
                (x.cast("double") - F.col("__mn")) / rng * 255 + F.lit(0.5)
            ),
        ),
    ).otherwise(F.transform(vec_col, lambda x: F.lit(0).cast("long")))
    out = out.withColumn(codes_col, codes)
    # max-of-elements (order-free — NOT the fold-sum hazard class).  The
    # empty-vector case keeps the historical 0.0 answer; a NULL vector
    # stays NULL (a missing embedding must not report a perfect error)
    err = F.when(
        F.col(vec_col).isNotNull(),
        F.coalesce(
            F.array_max(
                F.zip_with(
                    codes_col,
                    vec_col,
                    lambda c, x: F.abs(
                        F.col("__mn") + c.cast("double") * rng / 255
                        - x.cast("double")
                    ),
                )
            ),
            F.lit(0.0),
        ),
    )
    return (
        out.withColumn(err_col, err)
        .withColumnRenamed("__mn", "q_min")
        .withColumnRenamed("__mx", "q_max")
    )
