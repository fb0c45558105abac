# -*- coding: utf-8 -*-
"""Streaming exact dedup on ingest.

The batch pipeline dedups with ``operators.dedup`` after the fact; for
continuously-arriving crawl data the idiomatic Spark form is the BUILT-IN
stateful ``dropDuplicates`` over a fingerprint column: the state store
(RocksDB-backed on a real cluster) keeps one entry per distinct
fingerprint, persists in the streaming checkpoint, and therefore dedups
ACROSS micro-batches and across job restarts — the streaming analogue of
``incremental_exact_dedup`` without re-scanning the output corpus per
increment.

State is unbounded without a watermark (exact forever-dedup — the right
default for a bounded-vocabulary fingerprint like md5 of canonical text);
pass ``watermark=(ts_col, delay)`` to bound state to the late-data window
(``dropDuplicatesWithinWatermark`` semantics: duplicates arriving within
the window are dropped, state for older fingerprints is evicted).

The reference has no streaming surface (SURVEY.md §2); this is an engine
addition alongside ``stream_extract`` / ``sessionize``.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FINGERPRINT_COLUMN = "_fp"


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    watermark: Optional[Tuple[str, str]] = None,
) -> DataFrame:
    """Emit only the FIRST arrival of every distinct ``text_col`` value
    (by md5 fingerprint); later arrivals — same micro-batch, later batch,
    or after a restart — are dropped via checkpoint-persisted state.

    Returns the input rows plus the ``_fp`` column (the same column
    ``incremental_exact_dedup`` persists, so a streaming-deduped corpus
    and a batch-deduped corpus are mutually resumable — VERIFIED in
    tests/test_stateful_streaming.py). Interop caveat: write the corpus
    via ``foreachBatch`` (plain parquet), not the default streaming file
    sink — the file sink's ``_spark_metadata`` transaction log makes any
    file appended later by a BATCH job invisible to readers of the
    directory."""
    fingerprinted = stream.withColumn(FINGERPRINT_COLUMN, F.md5(F.col(text_col)))
    if watermark is not None:
        ts_col, delay = watermark
        return fingerprinted.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            [FINGERPRINT_COLUMN]
        )
    return fingerprinted.dropDuplicates([FINGERPRINT_COLUMN])
