#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Standalone extraction job for the scaling benchmark — submitted via
``spark-submit --py-files`` at two parallelism levels (the sandbox proxy
for N vs 4N executors; BASELINE.md explains the mapping).

Reads a pages parquet directory, runs the fused extraction stage, writes to
a noop sink, prints one JSON line with wall time and docs/sec.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--cores", type=int, required=True)
    parser.add_argument("--repeat", type=int, default=1)
    args = parser.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName(f"scaling-extract-{args.cores}")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # identical input splits at both parallelism levels
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "1m")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages

    pages = spark.read.parquet(args.input)
    n_docs = pages.count()

    timings = []
    for _ in range(args.repeat):
        started = time.perf_counter()
        extract_pages(pages, drop_payload=True).write.format("noop").mode("overwrite").save()
        timings.append(time.perf_counter() - started)
    best = min(timings)
    print(
        json.dumps(
            {
                "cores": args.cores,
                "docs": n_docs,
                "seconds": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
                "runs": [round(t, 3) for t in timings],
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
