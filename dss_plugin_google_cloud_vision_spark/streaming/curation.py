# -*- coding: utf-8 -*-
"""Incremental corpus curation as ONE Structured Streaming job.

The batch curation plan (``plans.web_curation``) re-reads the corpus per
run; for continuously-arriving crawl data the streaming form runs
extract → quality gate → exact dedup in a single ``Trigger.AvailableNow``
pass per arrival wave, with all cross-run memory living in the streaming
checkpoint:

- file progress (which page files were extracted) — source offsets;
- the dedup ledger (which fingerprints exist) — the built-in
  ``dropDuplicates`` state store (RocksDB-backed on a real cluster).

Every stage before the dedup is STATELESS and row-local (the typed
extraction kernel and the Gopher gate are narrow projections), so the only
state this job carries is the 16-byte-per-distinct-doc fingerprint set —
the minimum any exactly-once curator must remember.

The corpus is written via ``foreachBatch`` plain parquet appends (NOT the
streaming file sink): the file sink's ``_spark_metadata`` log would hide
files appended later by batch jobs, and the ``_fp`` column written here is
the same one ``operators.dedup.incremental_exact_dedup`` persists — a
streaming-curated corpus and a batch-curated corpus are mutually
resumable (the interop contract verified in tests/test_stateful_streaming).

The reference plugin is strictly batch (SURVEY.md §2: "Streaming: none");
this composition is an engine addition.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..errors import ErrorHandling
from ..operators.pages import extract_pages_typed
from ..operators.textstats import gopher_columns
from ..sources.pages import PAGES_DDL
from .dedup import stream_exact_dedup
from .util import available_now_foreach_batch


def stream_curate_available_now(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    min_words: int = 40,
    watermark: Optional[Tuple[str, str]] = None,
) -> StreamingQuery:
    """Curate every not-yet-processed page file, then stop: typed
    extraction (errors filtered out), Gopher quality gate (``min_words``
    floor; the other thresholds at their defaults), exact first-arrival
    dedup, parquet append. Safe to re-run on every arrival wave.

    The curation unit is the extracted PAGE row (multi-page documents
    contribute one row per page — merging pages back into documents is a
    stateful group the batch plan does after the fact; the stream keeps
    every stage stateless except the dedup ledger). Output rows: url,
    warc_ts, lang, page_number, text, n_words, _fp."""
    def curate(pages):
        extracted = extract_pages_typed(pages, error_handling=ErrorHandling.LOG)
        docs = (
            extracted.filter(F.col("error_type") == "")
            .select(
                "url",
                "warc_ts",
                "lang",
                "page_number",
                F.col("extracted_text").alias("text"),
            )
        )
        gate = gopher_columns(min_words=min_words)
        gated = docs.withColumn("n_words", gate["n_words"]).filter(gate["keep"] == 1)
        return stream_exact_dedup(gated, watermark=watermark)

    def append_corpus(batch_df, batch_id):
        batch_df.write.mode("append").parquet(output_dir)

    return available_now_foreach_batch(
        spark, input_dir, checkpoint_dir, PAGES_DDL, append_corpus, transform=curate
    )
