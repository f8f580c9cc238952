from parquery_spark.operators import (
    dedup,
    joins,
    multimodal,
    similarity,
    skew,
    windows,
)

__all__ = ["dedup", "similarity", "joins", "windows", "multimodal", "skew"]
