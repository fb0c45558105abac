# -*- coding: utf-8 -*-
"""Streaming incremental near-dedup (streaming/near_dup.py): the
band-ledger streaming form of ``incremental_near_dup_filter``.

Convergence contract: across AvailableNow waves — including re-delivered
exact texts and cross-run near-duplicates — the accepted corpus must
equal the BATCH filter run over everything ever delivered (keep-first on
id). Plus the torn-write healing path: a corpus whose band ledger was
lost mid-append still catches re-delivered duplicates on the next wave.
"""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.dedup import (
    incremental_near_dup_filter,
)
from dss_plugin_google_cloud_vision_spark.streaming.near_dup import (
    stream_near_dup_filter_available_now,
)

DDL = "doc_id bigint, text string"


def _doc_text(i: int, mutate: bool = False) -> str:
    """40 distinct tokens unique to doc family ``i``; ``mutate`` flips the
    last token — 1 of 38 trigram shingles changes, Jaccard 37/39 ≈ 0.95,
    comfortably above the 0.8 near-dup threshold. Distinct families share
    no token, so no cross-family candidate pairs exist."""
    toks = [f"w{i}x{j}" for j in range(40)]
    if mutate:
        toks[-1] = f"w{i}mutated"
    return " ".join(toks)


def _write_wave(spark, input_dir: str, rows) -> None:
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(input_dir)


def _run_wave(spark, tmp_path) -> None:
    q = stream_near_dup_filter_available_now(
        spark,
        str(tmp_path / "in"),
        str(tmp_path / "corpus"),
        str(tmp_path / "bands"),
        str(tmp_path / "ckpt"),
        DDL,
    )
    q.awaitTermination(300)


def test_streaming_near_dup_converges_to_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")

    # wave 1: ten distinct docs + one within-wave near-dup of doc 5
    wave1 = [(i, _doc_text(i)) for i in range(10)] + [(100, _doc_text(5, mutate=True))]
    _write_wave(spark, input_dir, wave1)
    _run_wave(spark, tmp_path)
    first_ids = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()}
    assert first_ids == set(range(10))  # 100 dropped within its wave

    # wave 2: five new docs, one CROSS-RUN near-dup (of wave-1's doc 3),
    # and three wave-1 texts RE-DELIVERED verbatim under new ids
    wave2 = (
        [(i, _doc_text(i)) for i in range(10, 15)]
        + [(200, _doc_text(3, mutate=True))]
        + [(300 + i, _doc_text(i)) for i in range(3)]
    )
    _write_wave(spark, input_dir, wave2)
    _run_wave(spark, tmp_path)

    corpus = spark.read.parquet(str(tmp_path / "corpus"))
    got_ids = {r["doc_id"] for r in corpus.collect()}

    # batch equivalent: the same filter over everything ever delivered
    all_rows = spark.createDataFrame(wave1 + wave2, DDL)
    empty = spark.createDataFrame([], DDL)
    want_ids = {
        r["doc_id"] for r in incremental_near_dup_filter(all_rows, empty).collect()
    }
    assert got_ids == want_ids == set(range(15))
    # exactly once: no id admitted twice across waves
    assert corpus.count() == len(got_ids)
    # the band ledger covers exactly the accepted corpus
    ledger_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "bands")).select("doc_id").distinct().collect()
    }
    assert ledger_ids == got_ids


def test_streaming_near_dup_heals_torn_band_ledger(spark, tmp_path):
    input_dir = str(tmp_path / "in")

    _write_wave(spark, input_dir, [(i, _doc_text(i)) for i in range(5)])
    _run_wave(spark, tmp_path)

    # simulate the torn-write crash: corpus rows landed, bands did not
    shutil.rmtree(str(tmp_path / "bands"))

    # next wave re-delivers doc 0's text verbatim and a near-dup of doc 2
    _write_wave(
        spark,
        input_dir,
        [(500, _doc_text(0)), (501, _doc_text(2, mutate=True)), (20, _doc_text(20))],
    )
    _run_wave(spark, tmp_path)

    got_ids = {
        r["doc_id"] for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert got_ids == {0, 1, 2, 3, 4, 20}  # healing caught both duplicates
    # the healed ledger covers the whole corpus again
    ledger_ids = {
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "bands")).select("doc_id").distinct().collect()
    }
    assert ledger_ids == got_ids
