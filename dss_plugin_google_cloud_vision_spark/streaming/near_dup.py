# -*- coding: utf-8 -*-
"""Streaming incremental NEAR-dedup: the band-ledger generalization of
``streaming.dedup``'s exact-fingerprint ledger.

``operators.dedup.incremental_near_dup_filter`` is the batch form: an
increment's MinHash bands join a PERSISTED corpus band table, matched
pairs are Jaccard-verified, survivors append. This module runs that
filter per arrival wave as a Structured Streaming job
(``Trigger.AvailableNow`` + ``foreachBatch``): file progress lives in the
streaming checkpoint; the cross-run dedup memory lives in TWO parquet
ledgers the batch operators already understand —

- ``corpus_dir``   — accepted rows (text + passthrough columns);
- ``bands_dir``    — their (id, band, band_key) MinHash band table, so an
  increment never re-shingles the corpus (the 100 TB invariant).

Why ``foreachBatch`` and not built-in stateful ops: near-dedup is a
band-join + verify against ALL prior acceptances — not a keyed
``dropDuplicates`` — and Structured Streaming offers no stateful
theta-join; the per-batch batch-operator reuse IS the idiomatic Spark
form (same pattern the exactly-once curator uses for corpus appends).

Crash safety (torn-write window): survivors append to ``corpus_dir``
FIRST, then their bands. A crash between the two leaves accepted rows
unbanded — so every batch begins by HEALING the ledger: corpus ids
missing from the band table (an id-only anti-join over two narrow
columns) are re-shingled and their bands appended. Healing runs before
filtering, so a replayed or re-delivered wave is caught as near-dups of
the now-banded corpus: no data loss, duplicates bounded to a single torn
batch, re-delivery converges to the batch result (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    DEFAULT_BANDS,
    DEFAULT_MAX_BAND_BUCKET,
    DEFAULT_N_HASHES,
    DEFAULT_SHINGLE_K,
    _corpus_path_exists,
    incremental_near_dup_filter,
    lsh_band_keys,
    minhash_signature,
)
from .util import available_now_foreach_batch


def _band_table(
    df: DataFrame, id_col: str, text_col: str, n_hashes: int, bands: int, shingle_k: int
) -> DataFrame:
    return lsh_band_keys(
        minhash_signature(df, id_col, text_col, n_hashes, shingle_k),
        id_col,
        n_hashes,
        bands,
    ).select(id_col, "band", "band_key")


def stream_near_dup_filter_available_now(
    spark: SparkSession,
    input_dir: str,
    corpus_dir: str,
    bands_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    threshold_milli: int = 800,
    max_bucket_size: int | None = DEFAULT_MAX_BAND_BUCKET,
) -> StreamingQuery:
    """Admit every not-yet-processed input file's rows that are NOT
    near-duplicates of the accepted corpus (nor of a lower-id row in the
    same wave), then stop. Safe to re-run per arrival wave; re-delivered
    or replayed rows converge to the batch result (they are near-dups of
    their own prior acceptance)."""

    def process_wave(batch_df: DataFrame, batch_id: int) -> None:
        session = batch_df.sparkSession
        have_corpus = _corpus_path_exists(session, corpus_dir)
        have_bands = _corpus_path_exists(session, bands_dir)
        if have_corpus:
            corpus = session.read.parquet(corpus_dir)
            if have_bands:
                ledger = session.read.parquet(bands_dir)
            else:
                ledger = None
            # heal the torn-write window: corpus rows whose bands never
            # landed are re-shingled (id-only anti-join — narrow columns)
            if ledger is not None:
                unbanded = corpus.join(
                    ledger.select(id_col).distinct(), id_col, "left_anti"
                )
            else:
                unbanded = corpus
            missing = _band_table(
                unbanded, id_col, text_col, n_hashes, bands, shingle_k
            ).localCheckpoint()
            if missing.limit(1).count():
                missing.write.mode("append").parquet(bands_dir)
                ledger = session.read.parquet(bands_dir)
            survivors = incremental_near_dup_filter(
                batch_df,
                corpus,
                corpus_bands=ledger.select(id_col, "band", "band_key")
                if ledger is not None
                else None,
                id_col=id_col,
                text_col=text_col,
                n_hashes=n_hashes,
                bands=bands,
                shingle_k=shingle_k,
                threshold_milli=threshold_milli,
                max_bucket_size=max_bucket_size,
            )
        else:
            # first wave: only within-wave dedup applies — an empty-corpus
            # filter run would be pure overhead, so filter against the
            # wave itself (keep-first rule is identical)
            empty = session.createDataFrame([], batch_df.schema)
            survivors = incremental_near_dup_filter(
                batch_df,
                empty,
                id_col=id_col,
                text_col=text_col,
                n_hashes=n_hashes,
                bands=bands,
                shingle_k=shingle_k,
                threshold_milli=threshold_milli,
                max_bucket_size=max_bucket_size,
            )
        # survivors feed two writes: pin them once (a recompute between
        # the corpus and band appends could not diverge — the plan is
        # deterministic — but would re-run the whole verify join)
        survivors = survivors.localCheckpoint()
        # corpus FIRST, bands second (see module docstring: healing
        # assumes corpus ⊇ bands, never the reverse)
        survivors.write.mode("append").parquet(corpus_dir)
        _band_table(
            survivors, id_col, text_col, n_hashes, bands, shingle_k
        ).write.mode("append").parquet(bands_dir)

    return available_now_foreach_batch(
        spark, input_dir, checkpoint_dir, schema_ddl, process_wave
    )
