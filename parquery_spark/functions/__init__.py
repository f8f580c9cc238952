from parquery_spark.functions import text

__all__ = ["text"]
