#!/usr/bin/env python
# -*- coding: utf-8 -*-
"""Dump .explain("formatted") for named declared queries into
plans/r06/<query>_<tag>.txt — the optimization round's before/after
plan evidence (judge-checkable without running Spark).

Usage: python tools/plan_r06.py <tag> <query> [<query> ...]
       python tools/plan_r06.py <tag> --all
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    import __spark_entry__ as entrymod
    from dss_plugin_google_cloud_vision_spark.session import get_spark

    tag = sys.argv[1]
    names = sys.argv[2:]
    qs = entrymod.queries()
    if names == ["--all"]:
        names = list(qs)
    spark = get_spark(app_name="plan-r06", cores=8)
    out_dir = os.path.join(REPO_ROOT, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as handle:
            handle.write(formatted(df).strip() + "\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
