from parquery_spark.operators import dedup, joins, similarity, windows

__all__ = ["dedup", "similarity", "joins", "windows"]
