"""Distributed dense linear algebra over embedding columns.

The core primitive is the quantized Gram matrix X^T X computed as
per-Arrow-batch numpy matmuls merged by (i, j) key — the textbook
distributed pattern for covariance/PCA at scale: each executor reduces
its rows to one d x d partial (d^2 ints), and only those partials move.
Communication is O(partitions * d^2), independent of row count.

Quantization (floor(x * scale + 0.5), the q116 engine-stable rounding)
makes every partial an exact int64, so the merged matrix is
order-independent and bit-reproducible on any engine — the same
move-the-float-reduction-into-an-exact-domain trick that oracles
k-means (q141).  A production variant would keep float64 partials and
accept last-ulp drift; the exact path costs nothing extra and makes the
result auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_matrix(
    df: DataFrame,
    vec_col: str,
    dim: int,
    scale: int = 1000,
) -> DataFrame:
    """Exact quantized Gram matrix: rows (i, j, gram) for all d^2 entries
    of sum_r q(x_r) q(x_r)^T with q(x) = floor(x*scale + 0.5) as int64.

    One mapInPandas pass emits a flattened d x d partial per Arrow batch
    (numpy int64 matmul — vectorized, no per-row Python); one groupBy
    (i, j) merges partials.  Shuffle volume is (#batches * d^2) rows of
    three ints, never the vectors themselves.
    """
    import numpy as np
    import pandas as pd

    d = int(dim)
    s = float(scale)

    def _partials(batches):
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Q = np.floor(X * s + 0.5).astype(np.int64)
            G = Q.T @ Q
            yield pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "partial": G.ravel(),
                }
            )

    parts = df.select(vec_col).mapInPandas(
        _partials, "i int, j int, partial long"
    )
    return parts.groupBy("i", "j").agg(F.sum("partial").alias("gram"))


def pca_components(gram_rows, dim: int, k: int, n_rows: int):
    """Driver-side finish: top-k eigenvectors of the (tiny) d x d Gram.

    ``gram_rows`` is the COLLECTED output of :func:`gram_matrix` (d^2
    scalars — the only thing that ever reaches the driver).  Returns
    (eigenvalues desc, components [k, d]) of the mean-free covariance is
    intentionally NOT computed here: callers wanting covariance subtract
    the mean outer product first; for whitening/top-direction use the
    raw second-moment spectrum is standard.
    """
    import numpy as np

    d = int(dim)
    G = np.zeros((d, d), dtype=np.float64)
    for r in gram_rows:
        G[r["i"], r["j"]] = r["gram"]
    G /= max(n_rows, 1)
    vals, vecs = np.linalg.eigh(G)
    order = np.argsort(vals)[::-1][:k]
    return vals[order], vecs[:, order].T
