from parquery_spark.operators import (
    dedup,
    graph,
    ivf,
    joins,
    multimodal,
    packing,
    profile,
    sampling,
    similarity,
    skew,
    windows,
)

__all__ = [
    "dedup", "similarity", "ivf", "joins", "windows", "multimodal",
    "sampling", "skew", "graph", "packing", "profile",
]
