# -*- coding: utf-8 -*-
"""Checkpoint-resume and per-partition lineage for the extraction pipeline.

The reference recomputes everything on re-run (eager pandas, no state); the
north rule upgrades this to snapshot-based resumability: re-running the job
must extract each url exactly once and converge to the same output as a
clean single run.

Design (SURVEY.md §4 custom-work item 2):

- **Snapshot** = the committed output table. On Iceberg this is a real
  snapshot with atomic commits; in this sandbox it degrades to a parquet
  directory written atomically per run-increment (subdirectory per attempt
  + _SUCCESS marker semantics supplied by Spark's committer).
- **Resume** = anti-join of the input table against the keys already in
  the output (``df.join(done, key, "left_anti")``). Only the key column of
  the snapshot is read (column pruning), so the resume scan of a 100 TB
  output touches a single string column.
- **Lineage** = one row per extraction task partition: partition id, input
  rows, pages out, success/error counts, wall ms — the reference's
  post-run metrics (parallelizer.py:242-248) persisted per partition, the
  north rule's "per-partition lineage rows". Written from inside the task
  (idempotent per partition id: re-attempts overwrite by name).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterable, Iterator, Optional

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

LINEAGE_DDL = (
    "run_id string, partition_id int, n_input bigint, n_output bigint, "
    "n_success bigint, n_error bigint, elapsed_ms bigint"
)


def with_lineage(
    extracted: DataFrame,
    response_column: str,
    lineage_dir: str,
    run_id: str,
) -> DataFrame:
    """Wrap an extracted DataFrame so that, as each task partition is
    consumed, a lineage row is written to ``lineage_dir`` (local/shared FS
    path; on a cluster this would be an object-store prefix or an Iceberg
    metrics table). Idempotent per (run_id, partition_id): retried tasks
    overwrite their own file."""
    os.makedirs(lineage_dir, exist_ok=True)
    schema = extracted.schema
    response_idx = extracted.columns.index(response_column)

    def audit(record_batches: Iterable[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        context = TaskContext.get()
        partition_id = context.partitionId() if context is not None else -1
        started = time.perf_counter()
        n_output = n_success = 0
        for rb in record_batches:
            responses = rb.column(response_idx)
            n_output += rb.num_rows
            n_success += sum(1 for value in responses.to_pylist() if value != "")
            yield rb
        elapsed_ms = int((time.perf_counter() - started) * 1000)
        row = {
            "run_id": run_id,
            "partition_id": partition_id,
            "n_input": n_output,  # page rows seen by this wrapper
            "n_output": n_output,
            "n_success": n_success,
            "n_error": n_output - n_success,
            "elapsed_ms": elapsed_ms,
        }
        path = os.path.join(lineage_dir, f"{run_id}-p{partition_id:05d}.json")
        tmp_path = path + ".tmp"
        with open(tmp_path, "w") as handle:
            json.dump(row, handle)
        os.replace(tmp_path, path)

    return extracted.mapInArrow(audit, schema)


def read_lineage(spark: SparkSession, lineage_dir: str) -> DataFrame:
    return spark.read.schema(LINEAGE_DDL).json(f"{lineage_dir}/*.json")


def remaining_inputs(
    input_df: DataFrame,
    spark: SparkSession,
    output_path: str,
    key: str = "url",
) -> DataFrame:
    """Anti-join the input against keys already present in the output
    snapshot. Reads only the key column of the snapshot (column pruning →
    parquet scan of one column)."""
    try:
        done = spark.read.parquet(output_path).select(key).distinct()
    except Exception:  # noqa: BLE001 — no snapshot yet: everything remains
        return input_df
    return input_df.join(done, key, "left_anti")


def run_with_resume(
    spark: SparkSession,
    input_df: DataFrame,
    build_extraction,
    output_path: str,
    key: str = "url",
    lineage_dir: Optional[str] = None,
    run_id: Optional[str] = None,
    response_column: str = "content_api_response",
) -> dict:
    """One resumable increment: anti-join → extract → append to snapshot.

    ``build_extraction(remaining_df) -> DataFrame`` supplies the extraction
    plan (e.g. ``extract_pages`` or the full pipeline's page output).
    Returns counts for the increment. Calling this again after a partial or
    failed run extracts only what is missing.
    """
    run_id = run_id or f"run-{int(time.time() * 1000)}"
    todo = remaining_inputs(input_df, spark, output_path, key)
    extracted = build_extraction(todo)
    if lineage_dir:
        extracted = with_lineage(extracted, response_column, lineage_dir, run_id)
    extracted.write.mode("append").parquet(output_path)
    written = spark.read.parquet(output_path)
    return {
        "run_id": run_id,
        "snapshot_rows": written.count(),
        "snapshot_keys": written.select(key).distinct().count(),
    }
