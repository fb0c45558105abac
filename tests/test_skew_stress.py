# -*- coding: utf-8 -*-
"""Skew stress: the salting machinery against an ACTUALLY Zipf-skewed
corpus (round-4 VERDICT ask — operators/skew.py existed but had only been
exercised on hand-planted 3-host toys).

A Common-Crawl-style host distribution is Zipf(1): the head host holds
~15% of a 500-host corpus (1/H_500). Any stage hash-partitioned on host
sends that 15% to ONE task — at 10^12 rows that task gets 1.5×10^11 rows
and the stage never finishes. These tests build a deterministic
Zipf-remapped pages corpus and assert the engine's answer end-to-end:

- ``hot_hosts`` finds the heavy hitters (and only them);
- ``salted_repartition`` bounds the max task input near the ideal share,
  where the unsalted host partitioning concentrates the head host's whole
  mass in one task;
- extraction + ``per_host_counts_two_phase`` over the salted corpus is
  EXACT (equals the direct per-host counts) — salting changes placement,
  never results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages
from dss_plugin_google_cloud_vision_spark.operators.skew import (
    hot_hosts,
    per_host_counts_two_phase,
    salted_repartition,
    zipf_host_remap,
)
from dss_plugin_google_cloud_vision_spark.sources.pages import pages_df

N_DOCS = 12_000
N_HOSTS = 500
N_PARTS = 64


def zipf_pages(spark, n_docs: int = N_DOCS, n_hosts: int = N_HOSTS):
    """Zipf(1)-host remap of the generated pages corpus (shared
    ``skew.zipf_host_remap``): payloads/timestamps stay the datagen's;
    only the url's host changes."""
    return zipf_host_remap(pages_df(spark, n_docs, partitions=8), n_hosts)


@pytest.fixture(scope="module")
def zipf(spark):
    df = zipf_pages(spark).localCheckpoint()
    host_counts = {
        r["host"]: r["n"]
        for r in df.groupBy(
            F.parse_url("url", F.lit("HOST")).alias("host")
        ).agg(F.count("*").alias("n")).collect()
    }
    return df, host_counts


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_corpus_is_actually_zipf(zipf):
    """Sanity: the head host holds >= 10% of the corpus (Zipf(1) over 500
    hosts gives ~15%) and at least 200 distinct hosts materialize — a real
    heavy-tail distribution, not a toy."""
    _, host_counts = zipf
    head = max(host_counts.values())
    assert head >= 0.10 * N_DOCS, head
    assert len(host_counts) >= 200


def test_hot_hosts_finds_the_head(zipf):
    """The heavy-hitter sketch returns exactly the hosts above threshold
    (h1 always; nothing below the cutoff)."""
    df, host_counts = zipf
    hot = hot_hosts(df, threshold_fraction=0.01)
    assert "h1.example.com" in hot
    total = sum(host_counts.values())
    want = {h for h, n in host_counts.items() if n > total * 0.01}
    assert set(hot) == want


def test_salting_bounds_max_task_input(zipf):
    """Unsalted host partitioning concentrates >= the head host's whole
    mass in one task; salted partitioning bounds the max task near the
    ideal share. The salted max must be (a) far below the head host's
    count and (b) within 4x of ideal (hash placement variance)."""
    df, host_counts = zipf
    head = max(host_counts.values())
    hot = hot_hosts(df, threshold_fraction=0.01)

    unsalted = df.repartition(N_PARTS, F.parse_url("url", F.lit("HOST")))
    unsalted_max = max(_partition_sizes(unsalted))
    assert unsalted_max >= head  # the hot host IS one task's input

    salted = salted_repartition(df, hot=hot, n_salt=16, num_partitions=N_PARTS)
    sizes = _partition_sizes(salted)
    assert sum(sizes) == N_DOCS
    salted_max = max(sizes)
    ideal = N_DOCS / N_PARTS
    assert salted_max < head / 3, (salted_max, head)
    assert salted_max <= 4 * ideal, (salted_max, ideal)


def test_extraction_over_salted_corpus_is_exact(zipf):
    """Salting + extraction + two-phase per-host counts returns the same
    (host, n_rows) table as a direct count over the unsalted extraction —
    placement changed, results did not. (Extraction emits >= 1 row per doc
    — multi-page PDFs fan out, error docs emit their error row — so the
    comparison is on extracted ROWS, not input docs.)"""
    df, _ = zipf
    sample = df.limit(2_000).localCheckpoint()
    hot = hot_hosts(sample, threshold_fraction=0.01)
    extracted = extract_pages(
        salted_repartition(sample, hot=hot, n_salt=16, num_partitions=N_PARTS),
        drop_payload=True,
    )
    got = [
        (r["host"], r["n_rows"])
        for r in per_host_counts_two_phase(extracted, granularity="year").collect()
    ]
    direct = {
        (r["host"], r["n"])
        for r in extract_pages(sample, drop_payload=True)
        .groupBy(F.parse_url("url", F.lit("HOST")).alias("host"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # two-phase output is (host, bucket, n_rows); collapse buckets per host
    from collections import defaultdict

    by_host = defaultdict(int)
    for host, n in got:
        by_host[host] += n
    assert set(by_host.items()) == direct
