from parquery_spark.functions import sketches, text

__all__ = ["text", "sketches"]
