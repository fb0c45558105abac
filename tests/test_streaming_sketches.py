# -*- coding: utf-8 -*-
"""Streaming sketch ledgers (streaming/sketches.py).

Convergence contract: after N AvailableNow waves, the merged ledger must
equal the batch sketch over everything ever delivered — and replays
(foreachBatch's at-least-once window) must not move it: max-merge
absorbs HLL replays natively; count-min replays collapse on batch_id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.sketches import (
    countmin_table,
    hll_estimate_from_registers,
    hll_register_table,
)
from dss_plugin_google_cloud_vision_spark.streaming.sketches import (
    read_countmin,
    read_hll_registers,
    stream_countmin_available_now,
    stream_hll_available_now,
)

DDL = "doc_id bigint, text string"


def _rows(lo, hi):
    return [(i, f"tok{i % 7} tok{i % 11} unique{i}") for i in range(lo, hi)]


def _write_wave(spark, input_dir, rows):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(input_dir)


def _regs_dict(df):
    return {r["bucket"]: r["register"] for r in df.collect()}


def _grid_dict(df):
    return {(r["row"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_streaming_hll_converges_to_batch(spark, tmp_path):
    input_dir, regs_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "regs"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 120))
    stream_hll_available_now(spark, input_dir, regs_dir, ckpt, DDL, "text").awaitTermination(
        300
    )
    _write_wave(spark, input_dir, _rows(100, 250))  # overlap: re-delivered texts
    stream_hll_available_now(spark, input_dir, regs_dir, ckpt, DDL, "text").awaitTermination(
        300
    )

    everything = spark.createDataFrame(_rows(0, 250), DDL)
    batch = hll_register_table(everything, "text")
    merged = read_hll_registers(spark, regs_dir)
    assert _regs_dict(merged) == _regs_dict(batch)
    est_stream = hll_estimate_from_registers(merged).head()
    est_batch = hll_estimate_from_registers(batch).head()
    assert est_stream["hll_estimate"] == est_batch["hll_estimate"]


def test_streaming_hll_replay_is_idempotent(spark, tmp_path):
    """Simulate an at-least-once replay: append the same wave's register
    table twice — the max-merge must not move."""
    input_dir, regs_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "regs"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 80))
    stream_hll_available_now(spark, input_dir, regs_dir, ckpt, DDL, "text").awaitTermination(
        300
    )
    before = _regs_dict(read_hll_registers(spark, regs_dir))
    # manual replay of the same wave's sketch (what a crashed-then-
    # restarted foreachBatch would re-append)
    hll_register_table(
        spark.createDataFrame(_rows(0, 80), DDL), "text"
    ).write.mode("append").parquet(regs_dir)
    assert _regs_dict(read_hll_registers(spark, regs_dir)) == before


def test_streaming_countmin_converges_to_batch(spark, tmp_path):
    input_dir, grid_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "grid"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 100))
    stream_countmin_available_now(
        spark, input_dir, grid_dir, ckpt, DDL
    ).awaitTermination(300)
    _write_wave(spark, input_dir, _rows(100, 300))
    stream_countmin_available_now(
        spark, input_dir, grid_dir, ckpt, DDL
    ).awaitTermination(300)

    everything = spark.createDataFrame(_rows(0, 300), DDL)
    assert _grid_dict(read_countmin(spark, grid_dir)) == _grid_dict(
        countmin_table(everything)
    )


def test_streaming_countmin_replay_collapses_on_batch_id(spark, tmp_path):
    """A replayed batch re-appends its grid under the SAME batch_id; the
    read-side per-(batch, cell) max keeps counts exactly-once. A torn
    append (partial cell set) is healed by the replay's full set."""
    input_dir, grid_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "grid"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 60))
    stream_countmin_available_now(
        spark, input_dir, grid_dir, ckpt, DDL
    ).awaitTermination(300)
    merged_before = _grid_dict(read_countmin(spark, grid_dir))

    wave = spark.createDataFrame(_rows(0, 60), DDL)
    full = countmin_table(wave).select(
        F.lit("run0").alias("run_id"),
        F.lit(0).cast("bigint").alias("batch_id"),
        "row",
        "bucket",
        "cnt",
    )
    # torn append first (half the cells), then the full replay
    full.filter(F.col("bucket") % 2 == 0).write.mode("append").parquet(grid_dir)
    full.write.mode("append").parquet(grid_dir)
    assert _grid_dict(read_countmin(spark, grid_dir)) == merged_before


def test_streaming_countmin_new_run_id_sums_not_collapses(spark, tmp_path):
    """A fresh checkpoint restarts batch ids at 0: with a NEW run_id the
    re-delivered wave SUMS against the old run's batch 0 (double count,
    as delivered); the run_id column is what keeps that distinct from a
    same-run replay, which still collapses."""
    input_dir, grid_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "grid"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 60))
    stream_countmin_available_now(
        spark, input_dir, grid_dir, ckpt, DDL, run_id="runA"
    ).awaitTermination(300)
    once = _grid_dict(read_countmin(spark, grid_dir))

    # checkpoint lost: same input reprocessed from scratch under a new run
    stream_countmin_available_now(
        spark, input_dir, grid_dir, str(tmp_path / "ckpt2"), DDL, run_id="runB"
    ).awaitTermination(300)
    twice = _grid_dict(read_countmin(spark, grid_dir))
    assert twice == {cell: 2 * cnt for cell, cnt in once.items()}


def test_streaming_corpus_minhash_converges_and_absorbs_replay(spark, tmp_path):
    from dss_plugin_google_cloud_vision_spark.operators.corpus_diff import (
        corpus_minhash,
        estimate_corpus_overlap,
    )
    from dss_plugin_google_cloud_vision_spark.streaming.sketches import (
        read_corpus_minhash,
        stream_corpus_minhash_available_now,
    )

    input_dir, sig_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "sig"),
        str(tmp_path / "ckpt"),
    )
    _write_wave(spark, input_dir, _rows(0, 120))
    stream_corpus_minhash_available_now(
        spark, input_dir, sig_dir, ckpt, DDL, "text"
    ).awaitTermination(300)
    _write_wave(spark, input_dir, _rows(100, 250))  # overlap: re-delivered texts
    stream_corpus_minhash_available_now(
        spark, input_dir, sig_dir, ckpt, DDL, "text"
    ).awaitTermination(300)

    everything = spark.createDataFrame(_rows(0, 250), DDL)
    batch_sig = {r.slot: r.min_hash for r in corpus_minhash(everything).collect()}
    ledger_sig = {r.slot: r.min_hash for r in read_corpus_minhash(spark, sig_dir).collect()}
    assert ledger_sig == batch_sig

    # a torn/replayed wave appends duplicate rows; the min-merge absorbs
    # them (simulate by re-appending wave 1's signature verbatim)
    corpus_minhash(spark.createDataFrame(_rows(0, 120), DDL)).write.mode("append").parquet(sig_dir)
    again = {r.slot: r.min_hash for r in read_corpus_minhash(spark, sig_dir).collect()}
    assert again == batch_sig

    # and the live ledger signature plugs straight into the overlap estimate
    est = estimate_corpus_overlap(
        read_corpus_minhash(spark, sig_dir), corpus_minhash(everything)
    ).collect()[0]
    assert est.matching_slots == est.n_hashes
