"""Declarative corpus-preparation pipelines.

``CorpusPipeline`` is the front door that composes the engine's data-prep
operators — quality gates, dedup, sampling, token accounting — into ONE
lazy Spark plan.  Stages are declared, not executed; ``build`` returns a
DataFrame whose physical plan fuses every narrow stage into the scan and
pays one shuffle per stage that genuinely needs a key (dedup's
fingerprint, the final rollup).  Nothing materializes until an action,
so Catalyst sees the whole pipeline at once: filters push into the
parquet scan even though they were declared as separate stages.

This is the API a user runs at 100 TB:

    pipe = (CorpusPipeline(text_col="text", id_col="doc_id")
            .filter_lang("en")
            .min_chars(200)
            .quality_range(0.3, 1.0)
            .dedup_fingerprint()
            .hash_sample(0.5, salt="corpus1")
            .with_token_counts())
    df = pipe.build(docs)           # lazy; compose further or write

Each stage maps to an operator gated elsewhere in the oracled suite
(q41 dedup, q58 sampling, q48 token stats, q150/q183 end-to-end), so
the composition inherits per-stage correctness evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusPipeline:
    text_col: str = "text"
    id_col: str = "doc_id"
    _stages: list[tuple[str, Callable[[DataFrame], DataFrame]]] = field(
        default_factory=list
    )

    def _add(self, name: str, fn) -> "CorpusPipeline":
        self._stages.append((name, fn))
        return self

    # -- quality gates (narrow: fuse into the scan) ---------------------
    def filter_lang(self, lang: str) -> "CorpusPipeline":
        return self._add("filter_lang", lambda df: df.where(
            F.col("lang") == lang
        ))

    def min_chars(self, n: int) -> "CorpusPipeline":
        return self._add("min_chars", lambda df: df.where(
            F.col("n_chars") >= n
        ))

    def quality_range(self, lo: float, hi: float) -> "CorpusPipeline":
        from parquery_spark.functions.text import quality_score

        return self._add("quality_range", lambda df: df.where(
            quality_score(F.col(self.text_col)).between(lo, hi)
        ))

    def custom_filter(self, cond) -> "CorpusPipeline":
        return self._add("custom_filter", lambda df: df.where(cond))

    # -- dedup (one shuffle on the content key) -------------------------
    def dedup_exact(self) -> "CorpusPipeline":
        return self._dedup(F.md5(F.col(self.text_col)))

    def dedup_fingerprint(self) -> "CorpusPipeline":
        from parquery_spark.functions.text import fingerprint

        return self._dedup(fingerprint(F.col(self.text_col)))

    def _dedup(self, key_col) -> "CorpusPipeline":
        from pyspark.sql import Window

        def fn(df):
            w = Window.partitionBy("__fp").orderBy(self.id_col)
            return (
                df.withColumn("__fp", key_col)
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn", "__fp")
            )

        return self._add("dedup", fn)

    # -- sampling (pure hash function — no RNG state) -------------------
    def hash_sample(self, rate: float, salt: str) -> "CorpusPipeline":
        from parquery_spark.operators.dedup import hash64

        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"hash_sample rate must be in [0, 1]: {rate}")
        # parts-per-million bucket space: a coarse mod-100 space silently
        # coerces every rate to a whole percent and samples NOTHING below
        # 0.005 — ppm keeps any sane rate faithful to ~1e-6
        ppm = int(round(rate * 1_000_000))

        def fn(df):
            return df.where(
                hash64(F.col(self.id_col).cast("string"), seed=salt)
                % 1_000_000
                < ppm
            )

        return self._add("hash_sample", fn)

    # -- accounting -----------------------------------------------------
    def with_token_counts(self, out: str = "n_tokens") -> "CorpusPipeline":
        from parquery_spark.functions.text import token_count

        return self._add("token_counts", lambda df: df.withColumn(
            out, token_count(F.col(self.text_col)).cast("long")
        ))

    # -- terminal -------------------------------------------------------
    def build(self, docs: DataFrame) -> DataFrame:
        df = docs
        for _name, fn in self._stages:
            df = fn(df)
        return df

    def summary(self, docs: DataFrame, by: str = "source") -> DataFrame:
        """Per-group training accounting over the pipeline output."""
        df = self.build(docs)
        aggs = [F.count(F.lit(1)).alias("n_docs")]
        if "n_tokens" in df.columns:
            aggs += [
                F.sum("n_tokens").alias("total_tokens"),
                F.sum(
                    F.ceil(F.col("n_tokens").cast("double") / 512)
                ).alias("n_chunks"),
            ]
        return df.groupBy(by).agg(*aggs)

    def stage_names(self) -> list[str]:
        return [n for n, _ in self._stages]
