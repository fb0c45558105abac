# -*- coding: utf-8 -*-
"""Output sinks with schema + column-description propagation.

Reference behavior being re-expressed: ``write_with_schema`` (S4) and
``set_column_description`` (S5, reference: python-lib/dku_io_utils.py:48-79
— merged descriptions, input dataset wins on name match).

Iceberg is the target catalog (`ALTER TABLE ... ALTER COLUMN ... COMMENT`
after `writeTo(...).createOrReplace()`); this sandbox has no Iceberg
runtime jar, so the sink degrades to parquet + a JSON sidecar carrying the
column descriptions (documented SURVEY.md §7 risk). The API is
catalog-agnostic: callers never branch.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from ..operators.formatters import merge_column_descriptions, with_column_descriptions

DESCRIPTIONS_SIDECAR = "_column_descriptions.json"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def write_output(
    df: DataFrame,
    target: str,
    descriptions: Optional[Dict[str, str]] = None,
    input_descriptions: Optional[Dict[str, str]] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` to ``target`` with column descriptions.

    ``target`` is an Iceberg table name when a catalog is configured (dots
    in the name and Iceberg on the classpath), else a parquet path.
    Description merge rule: input dataset's comments win (reference
    dku_io_utils.py:71-78).
    """
    spark = df.sparkSession
    merged = merge_column_descriptions(descriptions or {}, input_descriptions or {})
    described = with_column_descriptions(df, merged)
    use_iceberg = "." in target and "/" not in target and _iceberg_available(spark)
    if use_iceberg:
        writer = described.writeTo(target).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        else:
            writer.append()
        for column, comment in merged.items():
            escaped = comment.replace("'", "''")
            spark.sql(f"ALTER TABLE {target} ALTER COLUMN {column} COMMENT '{escaped}'")
        return
    described.write.mode(mode).parquet(target)
    if merged:
        sidecar = os.path.join(target, DESCRIPTIONS_SIDECAR)
        with open(sidecar, "w") as handle:
            json.dump(merged, handle, indent=1, sort_keys=True)


def read_column_descriptions(spark: SparkSession, target: str) -> Dict[str, str]:
    """Descriptions back from the sidecar (or, on Iceberg, DESCRIBE)."""
    sidecar = os.path.join(target, DESCRIPTIONS_SIDECAR)
    if os.path.exists(sidecar):
        with open(sidecar) as handle:
            return json.load(handle)
    return {}


DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def write_sized_output(
    df: DataFrame,
    target: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    sample_rows: int = 1000,
    mode: str = "overwrite",
) -> int:
    """Write parquet with a per-file size target — the small-files guard a
    100 TB pipeline needs (an extraction job with 10^5 tasks would
    otherwise emit 10^5 tiny files and every downstream scan pays the
    open/footer cost per file).

    Mechanism: estimate bytes/row from a ``sample_rows``-row sample's
    in-memory size (cheap driver-side estimate; parquet compresses further
    so the target is an upper-bound heuristic), derive ``maxRecordsPerFile``
    — which caps file size WITHOUT a shuffle — and let AQE's coalesce
    handle the too-many-small-partitions side. Returns the
    records-per-file used.

    This is the parquet-path analogue of Iceberg's
    ``write.target-file-size-bytes`` table property, which the Iceberg
    branch of ``write_output`` inherits from the table configuration.
    """
    sample = df.limit(sample_rows).collect()
    if sample:
        # driver-side row-size estimate: sum of string/binary payloads +
        # fixed 16B per primitive — deliberately rough, upper-bound-safe
        def row_bytes(row) -> int:
            total = 0
            for value in row:
                if isinstance(value, (str, bytes, bytearray)):
                    total += len(value)
                elif isinstance(value, (list, tuple)):
                    total += 16 * len(value)
                else:
                    total += 16
            return total

        avg = max(1, sum(row_bytes(r) for r in sample) // len(sample))
    else:
        avg = 1024
    records_per_file = max(1, target_file_bytes // avg)
    df.write.mode(mode).option("maxRecordsPerFile", records_per_file).parquet(target)
    return records_per_file
