"""Structured Streaming wrapper for incremental extraction (extra).

The reference has NO streaming operators (SURVEY.md §2.10): its async-task
layer is batch with polled progress.  The faithful re-expression is the
batch pipeline with resumable checkpoints.  This module is the additive
streaming path for users who ingest transcripts continuously: a
``readStream`` over an append-only transcripts directory/table, the same
Arrow-batched extraction kernel per micro-batch, and an append sink with
exactly-once semantics via the streaming checkpoint.

The kernel is stateless per row, so no watermark/state store is needed --
late rows extract identically whenever they arrive.  (For event-time
windowed analytics over the extraction output, standard watermarked
aggregations compose on top.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .pipeline import _extract_batches, EXTRACTION_SCHEMA
from .schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over an append-only transcripts directory."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def extract_stream(transcripts: DataFrame) -> DataFrame:
    """Streaming extraction: same kernel, per micro-batch.

    No pre-shuffle: a streaming repartition would force a stateful
    exchange; file-source micro-batches already bound partition size via
    maxFilesPerTrigger, and skew across conversations inside one
    micro-batch is bounded by the source file layout.
    """
    return transcripts.select("conv_id", "turn_idx", "text").mapInPandas(
        _extract_batches, schema=EXTRACTION_SCHEMA
    )


def start_extraction_stream(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """End-to-end stream: transcripts dir -> extraction parquet, resumable
    from the streaming checkpoint (exactly-once file sink)."""
    extracted = extract_stream(read_transcript_stream(spark, in_path))
    return (
        extracted.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .start()
    )
