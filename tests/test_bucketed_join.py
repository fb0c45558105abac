# -*- coding: utf-8 -*-
"""Bucketed co-located join: both sides bucketed on the key → join plan
must contain NO Exchange (the shuffle-free join strategy for repeated
joins against extraction output at scale)."""

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    stats = docs.select("doc_id", F.length("text").alias("text_len"))
    try:
        write_bucketed(docs.select("doc_id", "lang"), "bkt_docs", "doc_id", 8)
        write_bucketed(stats, "bkt_stats", "doc_id", 8)
        joined = colocated_join(spark, "bkt_docs", "bkt_stats", "doc_id")
        # disable broadcast so the test exercises the SMJ path a 100TB
        # table would take
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan
            assert joined.count() == docs.count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_docs")
        spark.sql("DROP TABLE IF EXISTS bkt_stats")
