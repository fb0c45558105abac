# -*- coding: utf-8 -*-
"""Shared streaming plumbing: the AvailableNow + foreachBatch ledger
pattern every incremental job in this package uses (curation, near-dup,
sketches). One place for the readStream/trigger/checkpoint block so an
option change reaches all of them."""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


def available_now_foreach_batch(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    schema_ddl: str,
    process_wave: Callable[[DataFrame, int], None],
    transform: Optional[Callable[[DataFrame], DataFrame]] = None,
) -> StreamingQuery:
    """Process every not-yet-seen parquet file under ``input_dir`` through
    ``process_wave`` (foreachBatch — at-least-once; the callback must be
    idempotent or its effects absorbable), then stop. ``transform``, when
    given, is applied to the streaming DataFrame before the sink (stateless
    ops or streaming-supported stateful ones only)."""
    stream = (
        spark.readStream.schema(schema_ddl).format("parquet").option("path", input_dir).load()
    )
    if transform is not None:
        stream = transform(stream)
    return (
        stream.writeStream.foreachBatch(process_wave)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
