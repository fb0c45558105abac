# -*- coding: utf-8 -*-
"""Blob-folder ingest: files on disk/object store → the pages table shape.

The reference's input is a managed folder of blobs streamed one at a time
on the driver (reference: python-lib/dku_io_utils.py:16-45 path listing;
``folder.get_download_stream`` reads at google_vision_api_client.py:122,
167). The Spark-native ingest is the built-in ``binaryFile`` source: a
distributed scan that yields (path, modificationTime, length, content)
with partition-parallel reads and predicate pushdown on the path — no
driver byte-shuffling.

``pages_from_binary_files`` maps that straight onto the engine's pages
schema so a folder of .html/.pdf/.tiff blobs drops into every downstream
operator unchanged. Extension filtering (S1) happens via
``pathGlobFilter`` INSIDE the scan (file pruning, not a post-filter)."""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def pages_from_binary_files(
    spark: SparkSession,
    path: str,
    glob: Optional[str] = None,
) -> DataFrame:
    """Read a folder of document blobs as pages(url, warc_ts, html, text,
    lang): url = file path, warc_ts = file modification time, text/lang
    empty (to be filled by extraction). ``glob`` (e.g. ``*.{html,pdf}``
    style patterns per Spark's pathGlobFilter) prunes files at scan time —
    the reference's extension filter as a source option."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    blobs = reader.load(path)
    return blobs.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit("").alias("text"),
        F.lit("").alias("lang"),
    )
