"""Arrow IPC transport: ship query results between processes/nodes.

API parity with the reference (reference: parquery/transport.py:12-75): a
worker aggregates one file and sends the Arrow table to the caller as IPC
stream bytes, optionally base64-wrapped for JSON/SQS envelopes (~33% size
overhead, reference: parquery/transport.py:52).

Spark additions: ``df_to_ipc_bytes`` / ``ipc_bytes_to_df`` bridge a Spark
DataFrame across the same boundary (driver-side ``toArrow`` — appropriate
for *result*-sized tables only; large intermediates should stay as Parquet).
"""

from __future__ import annotations

import binascii

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession


def serialize_pa_table_bytes(table: pa.Table) -> bytes:
    """pyarrow.Table → Arrow IPC stream bytes."""
    sink = pa.BufferOutputStream()
    with pa.ipc.new_stream(sink, table.schema) as writer:
        writer.write_table(table)
    return sink.getvalue().to_pybytes()


def deserialize_pa_table_bytes(buf: bytes) -> pa.Table:
    """Arrow IPC stream bytes → pyarrow.Table."""
    with pa.ipc.open_stream(buf) as reader:
        return reader.read_all()


def serialize_pa_table_base64(table: pa.Table) -> str:
    """pyarrow.Table → base64 string (for JSON/SQS envelopes)."""
    # newline=False keeps the wire format byte-identical to the reference
    # (reference: parquery/transport.py:49-52 — no trailing '\n').
    return binascii.b2a_base64(
        serialize_pa_table_bytes(table), newline=False
    ).decode("ascii")


def deserialize_pa_table_base64(payload: str) -> pa.Table:
    """base64 string → pyarrow.Table."""
    return deserialize_pa_table_bytes(binascii.a2b_base64(payload.encode("ascii")))


def df_to_ipc_bytes(df: DataFrame) -> bytes:
    """Spark DataFrame → Arrow IPC bytes (driver-side materialization)."""
    return serialize_pa_table_bytes(df.toArrow())


def ipc_bytes_to_df(spark: SparkSession, buf: bytes) -> DataFrame:
    """Arrow IPC bytes → Spark DataFrame (Arrow-native createDataFrame)."""
    return spark.createDataFrame(deserialize_pa_table_bytes(buf))
