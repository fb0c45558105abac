# -*- coding: utf-8 -*-
"""SparkSession factory with the engine's scale-oriented defaults.

Local mode here is a stand-in for a multi-executor cluster: every setting is
chosen to be the one you would ship to a 1000-executor job (AQE on, skew
join handling on, Arrow batching sized for binary payloads), with only
master/memory being sandbox-local.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = "32"
# Arrow batch sizing rule: target tens of MB of binary payload per batch.
# A 2048↔8192 A/B on the extraction stage is a wash (within this VM's
# ±15% run-to-run drift), so the default stays small enough that a batch
# of real Common-Crawl pages (~50-100 KB each) lands in the target range.
DEFAULT_ARROW_BATCH_ROWS = "2048"


def get_spark(
    app_name: str = "spark-webtext-extract",
    cores: int | None = None,
    shuffle_partitions: str | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = f"local[{cores}]" if cores else "local[*]"
    # make the engine package importable from Spark python workers
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pythonpath = os.environ.get("PYTHONPATH", "")
    if repo_root not in pythonpath.split(os.pathsep):
        os.environ["PYTHONPATH"] = os.pathsep.join([repo_root, pythonpath]) if pythonpath else repo_root
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", DEFAULT_ARROW_BATCH_ROWS)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
