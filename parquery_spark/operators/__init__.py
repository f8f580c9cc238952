from parquery_spark.operators import (
    dedup,
    graph,
    ivf,
    joins,
    linalg,
    maintenance,
    multimodal,
    packing,
    profile,
    quality,
    safety,
    sampling,
    semdedup,
    similarity,
    skew,
    upsert,
    windows,
)

__all__ = [
    "dedup", "similarity", "ivf", "joins", "windows", "multimodal",
    "sampling", "skew", "graph", "packing", "profile", "upsert",
    "maintenance", "linalg", "quality", "safety", "semdedup",
]
