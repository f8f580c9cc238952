from parquery_spark.sources.binary import MEDIA_EXTENSIONS, read_binary_files
from parquery_spark.sources.parquet import (
    read_parquet_dataset,
    read_parquet_files,
    write_partitioned,
)

__all__ = [
    "read_parquet_files",
    "read_parquet_dataset",
    "write_partitioned",
    "read_binary_files",
    "MEDIA_EXTENSIONS",
]
