#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Isolated per-query timing for the optimization loop (guide §1.4):
times ONLY the named declared queries with the noop sink, same session
shape as bench.py, N repeats each (prints every sample — the VM drifts
±20%, so judge deltas by the spread, not one pair). Never replaces
bench.py (FROZEN driver contract); cite these numbers in
OPTIMIZATION_r06.md only.

Usage: python BENCH/bench_queries.py q1,q2,... [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
_pp = os.environ.get("PYTHONPATH", "")
if REPO_ROOT not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join([REPO_ROOT, _pp]) if _pp else REPO_ROOT

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    import __spark_entry__ as entrymod
    from dss_plugin_google_cloud_vision_spark.session import get_spark

    names = sys.argv[1].split(",")
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(
        app_name="bench-queries",
        cores=CPUS,
        shuffle_partitions=str(CPUS),
        extra_conf={
            "spark.sql.files.maxPartitionBytes": "2m",
            "spark.sql.files.openCostInBytes": "512k",
        },
    )
    qs = entrymod.queries()
    # warm python workers + JVM the same way bench.py does
    qs[names[0]](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out = {}
    for name in names:
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"bench: {name}")
            started = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - started, 3))
        out[name] = samples
        print(name, samples, "min", min(samples), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
