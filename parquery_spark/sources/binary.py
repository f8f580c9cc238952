"""Raw-file ingest for multimodal pipelines: ``spark.read.format
("binaryFile")`` wrapped into the :mod:`parquery_spark.operators.
multimodal` contract.

A real training-data pipeline starts from a bucket of media FILES, not
from payloads already inside parquet.  ``binaryFile`` is Spark's
distributed file-ingest source: the driver lists the tree once, splits
the file list across tasks, and each task reads its files' bytes into the
``content`` binary column — no driver-side data movement, scaling to
millions of objects exactly like a parquet scan scales to splits.

Pushdown surface (applied at listing time, before any byte is read):

* ``path_glob`` → ``pathGlobFilter`` (e.g. ``*.png``) — non-matching
  files are never opened;
* ``modified_after`` / ``modified_before`` → the source's
  ``modifiedAfter``/``modifiedBefore`` options — the incremental-ingest
  predicate (only new objects since the last batch);
* filters on the output's ``length``/``modificationTime`` columns push
  into the scan (Spark's BinaryFileFormat implements them) — e.g.
  ``.where(F.col("length") < 10*1024*1024)`` skips oversized blobs
  without reading them.

Output schema is the source's native one (``path``, ``modificationTime``,
``length``, ``content``) plus ``payload`` (alias of ``content``) and
``media_type`` (from the extension map, or a constant) so the result
feeds :func:`~parquery_spark.operators.multimodal.extract_media_features`
unchanged.

The reference (visualfabriq/parquery) has no file-ingest source — parquet
only (reference: parquery/aggregate.py:142-215); this module is part of
the beyond-reference multimodal surface (SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: extension → media_type for ``media_type="auto"``
MEDIA_EXTENSIONS = {
    "jpg": "image", "jpeg": "image", "png": "image", "gif": "image",
    "bmp": "image", "tif": "image", "tiff": "image", "webp": "image",
    "wav": "audio", "mp3": "audio", "flac": "audio", "ogg": "audio",
    "m4a": "audio", "aac": "audio",
    "mp4": "video", "mkv": "video", "avi": "video", "webm": "video",
    "mov": "video", "mpg": "video", "mpeg": "video",
}


def read_binary_files(
    spark: SparkSession,
    path: str,
    path_glob: str | None = None,
    modified_after: str | None = None,
    modified_before: str | None = None,
    recursive: bool = True,
    media_type: str = "auto",
) -> DataFrame:
    """Ingest a directory tree of raw files as a DataFrame of payloads.

    ``media_type="auto"`` derives the type from the file extension via
    :data:`MEDIA_EXTENSIONS` (unknown extensions get ``"unknown"``, which
    the decode layer rejects loudly — the codec-registry contract); any
    other string is attached as a constant.

    Timestamps for ``modified_after``/``modified_before`` use the
    source's accepted forms (e.g. ``2024-06-01T13:00:00``)."""
    reader = spark.read.format("binaryFile")
    if path_glob is not None:
        reader = reader.option("pathGlobFilter", path_glob)
    if modified_after is not None:
        reader = reader.option("modifiedAfter", modified_after)
    if modified_before is not None:
        reader = reader.option("modifiedBefore", modified_before)
    reader = reader.option("recursiveFileLookup", str(recursive).lower())
    df = reader.load(path)

    if media_type == "auto":
        ext = F.lower(
            F.regexp_extract(F.col("path"), r"\.([A-Za-z0-9]+)$", 1)
        )
        mapping = F.create_map(
            *[F.lit(x) for kv in MEDIA_EXTENSIONS.items() for x in kv]
        )
        mt = F.coalesce(mapping.getItem(ext), F.lit("unknown"))
    else:
        mt = F.lit(media_type)
    return df.withColumn("payload", F.col("content")).withColumn(
        "media_type", mt
    )
