from parquery_spark.operators import (
    dedup,
    ivf,
    joins,
    multimodal,
    sampling,
    similarity,
    skew,
    windows,
)

__all__ = [
    "dedup", "similarity", "ivf", "joins", "windows", "multimodal",
    "sampling", "skew",
]
