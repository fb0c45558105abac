# -*- coding: utf-8 -*-
"""Incremental extraction as a Structured Streaming job.

The reference is strictly batch (SURVEY.md §2 "Streaming: none"); the
engine adds an incremental mode for continuously-arriving crawl data:
``readStream`` over the pages directory → the same fused extraction stage →
``writeStream`` with ``Trigger.AvailableNow`` and a checkpoint location.

This is the second resume mechanism next to the snapshot anti-join
(``operators.resume``): the streaming checkpoint tracks processed *files*
exactly-once, so re-running the job after new files land extracts only the
new files — no anti-join scan of the output needed. On Iceberg the same
shape runs against incremental snapshot reads.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..errors import ErrorHandling
from ..operators.pages import extract_pages
from ..sources.pages import PAGES_DDL


def stream_extract_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    column_prefix: str = "content_api",
    error_handling: ErrorHandling = ErrorHandling.LOG,
    drop_payload: bool = True,
    max_files_per_trigger: Optional[int] = None,
) -> StreamingQuery:
    """Process every not-yet-processed page file, then stop. Exactly-once
    per file via the checkpoint; safe to re-run on arrival of new files."""
    reader = (
        spark.readStream.schema(PAGES_DDL)
        .format("parquet")
        .option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load()
    extracted = extract_pages(
        pages,
        column_prefix=column_prefix,
        error_handling=error_handling,
        drop_payload=drop_payload,
    )
    return (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )


def windowed_host_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time windowed aggregation with late-data handling: pages per
    host per warc_ts window. Returns the streaming DataFrame (caller picks
    the sink/trigger)."""
    from pyspark.sql import functions as F

    pages = spark.readStream.schema(PAGES_DDL).format("parquet").option("path", input_dir).load()
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "host", "n_pages")
    )
