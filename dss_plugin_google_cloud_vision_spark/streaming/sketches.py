# -*- coding: utf-8 -*-
"""Streaming corpus sketches: the HLL and count-min ledgers maintained
incrementally per arrival wave.

The whole point of a mergeable sketch at 100 TB is that keeping it
CURRENT must not require re-scanning the corpus — each arrival wave
contributes a bounded summary and the merge rule folds it in. Both jobs
run as ``Trigger.AvailableNow`` + ``foreachBatch`` appends of the wave's
sketch to a tiny parquet ledger (the batch-operator-reuse pattern of
``streaming.curation``/``streaming.near_dup``); file progress lives in
the streaming checkpoint.

Exactly-once semantics differ per sketch and drive the two designs:

- **HLL** (``stream_hll_available_now``): the merge is ``max`` over
  registers — IDEMPOTENT. A replayed wave (foreachBatch is
  at-least-once) re-appends identical register rows and the read-side
  max-merge (``read_hll_registers``) absorbs them; no batch-id
  bookkeeping is needed. This is the sketch-native form of the
  exactly-once guarantee.

- **count-min** (``stream_countmin_available_now``): the merge is SUM
  over cells — NOT idempotent, so each appended grid is stamped with
  ``(run_id, batch_id)`` and the read side (``read_countmin``) first
  collapses per-(run, batch, cell) duplicates with ``max`` (a replay of
  the same batch recomputes the identical deterministic grid, so max ==
  the value; a torn append that left only part of a batch's cells is
  healed by the replay's full set), THEN sums across batches — the
  standard idempotent-foreachBatch batch-id discipline. ``run_id`` exists
  because batch ids restart at 0 with a fresh checkpoint: a new
  checkpoint over a kept ledger needs a new run_id or its waves would
  collapse against the old run's same-numbered batches.

Ledger growth is bounded: ≤ 2^log2m rows per wave (HLL) / ≤ depth*width
rows per wave (count-min) — compaction is a plain rewrite of the merged
table if ever needed. The reference plugin is strictly batch (SURVEY.md
§2); this is part of the engine's streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketches import (
    CM_DEPTH,
    CM_SEED,
    CM_WIDTH,
    HLL_LOG2M,
    HLL_SEED,
    countmin_table,
    hll_register_table,
)
from .util import available_now_foreach_batch


def stream_hll_available_now(
    spark: SparkSession,
    input_dir: str,
    registers_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    value_col: str,
    log2m: int = HLL_LOG2M,
    seed: int = HLL_SEED,
) -> StreamingQuery:
    """Append each not-yet-processed wave's (bucket, register) table to
    the register ledger, then stop. Safe to re-run per arrival wave;
    replays are absorbed by the max-merge (idempotent)."""

    def process_wave(batch_df: DataFrame, batch_id: int) -> None:
        regs = hll_register_table(batch_df, value_col, log2m, seed)
        regs.write.mode("append").parquet(registers_dir)

    return available_now_foreach_batch(
        spark, input_dir, checkpoint_dir, schema_ddl, process_wave
    )


def read_hll_registers(spark: SparkSession, registers_dir: str) -> DataFrame:
    """The merged register table: max over every appended wave — identical
    to ``hll_register_table`` over everything ever delivered (tested).
    Feed to ``operators.sketches.hll_estimate_from_registers``."""
    return (
        spark.read.parquet(registers_dir)
        .groupBy("bucket")
        .agg(F.max("register").cast("int").alias("register"))
    )


def stream_countmin_available_now(
    spark: SparkSession,
    input_dir: str,
    grid_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    text_col: str = "text",
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    seed: int = CM_SEED,
    run_id: str = "run0",
) -> StreamingQuery:
    """Append each wave's count-min grid (stamped with (run_id, batch_id))
    to the grid ledger, then stop. Replays re-append under the SAME stamp
    and are collapsed at read time.

    ``run_id`` binds the batch-id sequence to its checkpoint lineage:
    batch ids restart at 0 whenever a checkpoint is recreated, so a new
    checkpoint over a kept ledger (or a second pipeline sharing the
    ledger dir) MUST pass a fresh run_id — otherwise its batch 0 would
    collapse against the old run's batch 0 at read time and silently
    undercount. Replays within one checkpoint keep the same run_id and
    dedupe exactly as before."""

    def process_wave(batch_df: DataFrame, batch_id: int) -> None:
        grid = countmin_table(batch_df, text_col, depth, width, seed).select(
            F.lit(run_id).alias("run_id"),
            F.lit(batch_id).cast("bigint").alias("batch_id"),
            "row",
            "bucket",
            "cnt",
        )
        grid.write.mode("append").parquet(grid_dir)

    return available_now_foreach_batch(
        spark, input_dir, checkpoint_dir, schema_ddl, process_wave
    )


def read_countmin(spark: SparkSession, grid_dir: str) -> DataFrame:
    """The merged grid: per-(run, batch, cell) max (replay dedup — a
    batch's grid is deterministic, so duplicates carry equal counts), then
    the cross-batch sum. Identical to ``countmin_table`` over everything
    ever delivered (tested). Feed to ``operators.sketches.countmin_estimates``."""
    per_batch = (
        spark.read.parquet(grid_dir)
        .groupBy("run_id", "batch_id", "row", "bucket")
        .agg(F.max("cnt").alias("cnt"))
    )
    return (
        per_batch.groupBy("row", "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )


def stream_corpus_minhash_available_now(
    spark: SparkSession,
    input_dir: str,
    signature_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    text_col: str = "text",
    n_hashes: int = None,
    shingle_k: int = None,
) -> StreamingQuery:
    """Streaming corpus-MinHash ledger (``operators.corpus_diff`` kept
    current per arrival wave): append each wave's (slot, min_hash)
    signature, then stop. Same exactly-once class as HLL — the read-side
    MIN-merge is idempotent, so replayed waves re-append identical rows
    and change nothing; an empty wave appends NULL slots, which ``min``
    ignores. Keeping a LIVE corpus signature makes 'how much of today's
    crawl is already in the lake?' a 12-row comparison instead of a
    corpus scan."""
    from ..operators.corpus_diff import corpus_minhash
    from ..operators.dedup import DEFAULT_N_HASHES, DEFAULT_SHINGLE_K

    nh = DEFAULT_N_HASHES if n_hashes is None else n_hashes
    sk = DEFAULT_SHINGLE_K if shingle_k is None else shingle_k

    def process_wave(batch_df: DataFrame, batch_id: int) -> None:
        sig = corpus_minhash(batch_df, text_col, nh, sk)
        sig.write.mode("append").parquet(signature_dir)

    return available_now_foreach_batch(
        spark, input_dir, checkpoint_dir, schema_ddl, process_wave
    )


def read_corpus_minhash(spark: SparkSession, signature_dir: str) -> DataFrame:
    """The merged corpus signature: slot-wise min over every appended
    wave — identical to ``corpus_diff.corpus_minhash`` over everything
    ever delivered (tested). Feed to
    ``corpus_diff.estimate_corpus_overlap`` against another signature."""
    return (
        spark.read.parquet(signature_dir)
        .groupBy("slot")
        .agg(F.min("min_hash").alias("min_hash"))
    )
