"""Multimodal column handling: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas`` — the Spark-side plumbing (schema, batching, partitioning)
is real; the codec itself is stubbed because media libraries are not
available in this environment.

Design for 100 TB:

* Payload bytes stay columnar end-to-end: parquet binary column → Arrow
  record batches → pandas ``bytes`` cells inside the UDF — no row-at-a-time
  Python serialization.
* ``mapInPandas`` streams batches (bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``), so executor memory is
  bounded regardless of corpus size; decode parallelism = task parallelism.
* Derived features come back as ordinary columns, so downstream filtering/
  dedup/similarity compose with everything else in this package.

Swap :func:`_decode_stub` for a real codec (PIL/ffmpeg/torchaudio) in
production — the signature and batch shape are the contract.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from parquery_spark.operators.util import fan_out

#: Schema of the feature struct produced per media payload.
MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def _decode_stub(payload: bytes, media_type: str) -> dict[str, Any]:
    """STUB decoder: deterministic fake features derived from the payload
    bytes.  A real deployment replaces this with PIL / ffmpeg / torchaudio —
    media codec libraries are not installed in this environment.

    Raises ``NotImplementedError`` for media types the stub doesn't model,
    exactly as a real codec registry would for unknown formats.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder registered for {media_type!r}")
    digest = hashlib.md5(payload).hexdigest()
    seed = int(digest[:8], 16)
    return {
        "n_bytes": len(payload),
        "content_hash": digest,
        "width": 64 + seed % 1024 if media_type != "audio" else None,
        "height": 64 + (seed >> 10) % 1024 if media_type != "audio" else None,
        "n_frames": 1 if media_type == "image" else 1 + seed % 300,
        "decode_ok": True,
    }


def extract_media_features(
    df: DataFrame,
    payload_col: str = "payload",
    media_type_col: str = "media_type",
    batch_limit: int | None = None,
) -> DataFrame:
    """Decode/feature-extract media payloads via ``mapInPandas``.

    Output: all input columns except the payload, plus the
    :data:`MEDIA_FEATURES_SCHEMA` fields.  The payload column is dropped on
    output so the (large) bytes don't travel through downstream shuffles.

    An under-split source (one small file → one task → ONE Python worker)
    is fanned out first so the Arrow batches stream to every core's
    worker; on a well-split corpus this is a no-op.
    """
    df = fan_out(df)
    passthrough = [c for c in df.columns if c != payload_col]
    out_schema = T.StructType(
        [df.schema[c] for c in passthrough] + list(MEDIA_FEATURES_SCHEMA)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_limit:
                pdf = pdf.iloc[:batch_limit]
            feats = [
                _decode_stub(payload, mtype)
                for payload, mtype in zip(pdf[payload_col], pdf[media_type_col])
            ]
            out = pdf[passthrough].reset_index(drop=True)
            yield pd.concat([out, pd.DataFrame(feats)], axis=1)

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(
    df: DataFrame,
    payload_col: str = "payload",
    target: tuple[int, int] = (224, 224),
) -> DataFrame:
    """STUB image resize: real plumbing (binary in → binary out through
    Arrow batches), fake transform (md5-tagged passthrough bytes)."""
    out_schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf[payload_col] = [
                hashlib.md5(b + f"@{target[0]}x{target[1]}".encode()).digest()
                for b in pdf[payload_col]
            ]
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_stub(
    df: DataFrame,
    payload_col: str = "payload",
    every_n: int = 10,
) -> DataFrame:
    """STUB video frame sampling: one output row per sampled frame
    (explode-shaped mapInPandas — demonstrates 1→N batch fan-out)."""
    out_schema = T.StructType(
        [f for f in df.schema if f.name != payload_col]
        + [T.StructField("frame_idx", T.IntegerType()),
           T.StructField("frame_hash", T.StringType())]
    )
    passthrough = [c for c in df.columns if c != payload_col]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                n_frames = 1 + int(hashlib.md5(payload).hexdigest()[:4], 16) % 50
                for idx in range(0, n_frames, every_n):
                    rec = {c: row[c] for c in passthrough}
                    rec["frame_idx"] = idx
                    rec["frame_hash"] = hashlib.md5(
                        payload + idx.to_bytes(4, "little")
                    ).hexdigest()
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=passthrough + ["frame_idx", "frame_hash"])

    return df.mapInPandas(run, schema=out_schema)


def attach_binary_payload(
    df: DataFrame, source_col: str, media_type: str = "image"
) -> DataFrame:
    """Helper to synthesize a binary payload column from a string column —
    used to exercise the multimodal plumbing on text-only fixtures."""
    return df.withColumn("payload", F.encode(F.col(source_col), "UTF-8")).withColumn(
        "media_type", F.lit(media_type)
    )
