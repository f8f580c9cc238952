"""parquery_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of visualfabriq/parquery, re-expressed
Spark-first, plus the large-scale-pipeline operators the reference lacks
(joins, windows, dedup, similarity search, text analysis, streaming).

Public API parity surface (reference: parquery/__init__.py:31-47) plus
extensions.
"""

from parquery_spark.aggregate import aggregate_plan, aggregate_pq, finalize_group_by
from parquery_spark.session import get_spark
from parquery_spark.transport import (
    deserialize_pa_table_base64,
    deserialize_pa_table_bytes,
    serialize_pa_table_base64,
    serialize_pa_table_bytes,
)
from parquery_spark.write import create_full_filename, df_to_parquet
from parquery_spark.tool import (
    FILTER_CUTOVER_LENGTH,
    HAS_DUCKDB,
    SAFE_PREAGGREGATE,
    VALID_FILTER_OPS,
    DataFilter,
    FilterCondition,
    FilterOperator,
    FilterValueError,
    df_to_natural_name,
    df_to_original_name,
    get_result_columns,
    normalize_measure_cols,
    to_natural_name,
    to_original_name,
)

__version__ = "0.1.0"

__all__ = [
    "aggregate_pq",
    "aggregate_plan",
    "finalize_group_by",
    "get_spark",
    "HAS_DUCKDB",
    "FilterOperator",
    "FilterCondition",
    "DataFilter",
    "df_to_parquet",
    "create_full_filename",
    "serialize_pa_table_bytes",
    "deserialize_pa_table_bytes",
    "serialize_pa_table_base64",
    "deserialize_pa_table_base64",
    "normalize_measure_cols",
    "get_result_columns",
    "df_to_natural_name",
    "df_to_original_name",
    "to_natural_name",
    "to_original_name",
    "VALID_FILTER_OPS",
    "SAFE_PREAGGREGATE",
    "FILTER_CUTOVER_LENGTH",
    "FilterValueError",
    "__version__",
]
