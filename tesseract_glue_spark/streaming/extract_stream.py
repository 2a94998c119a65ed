"""Streaming extraction: the flagship pipeline as a Structured
Streaming job with exactly-once manifest bookkeeping.

Documents arrive as files in a directory (stand-in for a Kafka/Iceberg
CDC feed); each micro-batch runs the SAME batch extraction pipeline via
``foreachBatch`` (batch-streaming unification — no second code path),
writes its buckets, and appends lineage manifests. Spark's streaming
checkpoint gives at-least-once micro-batches; the per-batch manifest
write is idempotent (atomic replace, bucket keyed by batch id), so the
combination is effectively exactly-once at the bucket level.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from tesseract_glue_spark.config import ExtractionConfig
from tesseract_glue_spark.fixtures import DOCUMENTS_SCHEMA


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 2
) -> DataFrame:
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(
    docs_stream: DataFrame,
    pages: DataFrame,
    out_dir: str,
    config: ExtractionConfig | None = None,
    checkpoint_dir: str | None = None,
    n_buckets: int = 16,
    extractor: Callable | None = None,
):
    """Start the streaming extraction; returns the StreamingQuery.

    Uses ``trigger(availableNow=True)`` so tests drain deterministically;
    production drops that for a continuous trigger. ``extractor`` swaps
    the per-batch pipeline (default :func:`extract_documents`; pass
    ``operators.web.extract_web_documents`` for the web pipeline — the
    batch-streaming unification means every nested-form extractor
    streams for free)."""
    from tesseract_glue_spark.operators.extract import extract_documents
    from tesseract_glue_spark.sources import manifests as M

    extract_fn = extractor or extract_documents
    cfg = (config or ExtractionConfig()).validated()
    checkpoint = checkpoint_dir or os.path.join(out_dir, "_checkpoint")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = extract_fn(batch_df, pages, cfg)
        # one subdirectory per micro-batch: buckets are doc-hash keyed,
        # so two batches share bucket ids — writing them into one dir
        # would dynamic-overwrite earlier batches' partitions. Replays
        # of the same batch id (at-least-once) overwrite idempotently.
        M.write_extracted(
            out, os.path.join(out_dir, f"batch={batch_id:06d}"), n_buckets=n_buckets
        )

    return (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
