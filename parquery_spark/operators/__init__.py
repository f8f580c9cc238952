from parquery_spark.operators import (
    dedup,
    ivf,
    joins,
    multimodal,
    similarity,
    skew,
    windows,
)

__all__ = [
    "dedup", "similarity", "ivf", "joins", "windows", "multimodal", "skew",
]
