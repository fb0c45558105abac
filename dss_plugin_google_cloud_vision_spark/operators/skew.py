# -*- coding: utf-8 -*-
"""Explicit skew handling for hot hosts (north-rule requirement).

Common-Crawl-style page tables are heavily host-skewed (a few hosts hold a
large share of urls). Any stage keyed on host — per-host politeness
grouping, per-host aggregates, co-located joins — would send a hot host's
entire key to one task. This module provides:

- ``with_host`` / ``with_time_bucket``: the ``(host, warc_ts-bucket)``
  partitioning key from BASELINE.json, derived JVM-side (``parse_url``,
  ``date_trunc``).
- ``hot_hosts``: cheap heavy-hitter sketch — ``groupBy(host).count()`` over
  a sample fraction, thresholded. One narrow aggregate over a single
  column; at 10^12 rows this runs on a 0.1% sample and still finds every
  host above the salt threshold with overwhelming probability.
- ``salt_column`` / ``salted_repartition``: hot hosts get a uniform salt in
  [0, n_salt) (hash of the full url — stable, not random), cold hosts salt
  0, then ``repartition(host, bucket, salt)``. Paired with AQE
  (``spark.sql.adaptive.enabled``, skew-join splitting) which handles the
  residual size imbalance at runtime.

Aggregations over salted partitions follow the standard two-phase shape:
partial aggregate on (host, bucket, salt), final aggregate on (host,
bucket) — both expressed as ordinary groupBys so Catalyst plans map-side
combines.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N_SALT = 16
DEFAULT_HOT_THRESHOLD_FRACTION = 0.01  # a host with >1% of rows is hot


def host_column(url_col: str = "url") -> Column:
    return F.parse_url(F.col(url_col), F.lit("HOST"))


def time_bucket_column(ts_col: str = "warc_ts", granularity: str = "day") -> Column:
    return F.date_trunc(granularity, F.col(ts_col))


def with_host(df: DataFrame, url_col: str = "url", out: str = "host") -> DataFrame:
    return df.withColumn(out, host_column(url_col))


def hot_hosts(
    df: DataFrame,
    url_col: str = "url",
    threshold_fraction: float = DEFAULT_HOT_THRESHOLD_FRACTION,
    sample_fraction: Optional[float] = None,
) -> List[str]:
    """Hosts holding more than ``threshold_fraction`` of (sampled) rows.
    The result is small by construction (≤ 1/threshold hosts) and safe to
    broadcast into the salt expression."""
    sampled = df.sample(fraction=sample_fraction, seed=7) if sample_fraction else df
    counts = sampled.select(host_column(url_col).alias("host")).groupBy("host").count()
    total = sampled.count()
    if total == 0:
        return []
    cutoff = total * threshold_fraction
    return [
        r["host"]
        for r in counts.filter(F.col("count") > cutoff).collect()
        if r["host"] is not None
    ]


def salt_column(
    url_col: str = "url",
    hot: Optional[List[str]] = None,
    n_salt: int = DEFAULT_N_SALT,
) -> Column:
    """Deterministic salt: uniform in [0, n_salt) for hot hosts (stable
    hash of the url), 0 for everyone else — cold keys stay un-split so
    downstream per-host aggregation needs no extra merge work for them."""
    salt = F.pmod(F.xxhash64(F.col(url_col)), F.lit(n_salt)).cast("int")
    if hot:
        return F.when(host_column(url_col).isin(list(hot)), salt).otherwise(F.lit(0))
    return salt


def salted_repartition(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_salt: int = DEFAULT_N_SALT,
    hot: Optional[List[str]] = None,
    granularity: str = "day",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Repartition on (host, time-bucket, salt). With ``hot`` unspecified,
    every host is salted (safe default when no sketch has been run)."""
    salted = (
        df.withColumn("_host", host_column(url_col))
        .withColumn("_bucket", time_bucket_column(ts_col, granularity))
        .withColumn("_salt", salt_column(url_col, hot, n_salt))
    )
    keys = [F.col("_host"), F.col("_bucket"), F.col("_salt")]
    out = salted.repartition(num_partitions, *keys) if num_partitions else salted.repartition(*keys)
    return out.drop("_host", "_bucket", "_salt")


def zipf_host_remap(
    df: DataFrame, n_hosts: int = 500, url_col: str = "url"
) -> DataFrame:
    """Deterministically remap each row's url host to a Zipf(1)
    distribution over ``n_hosts`` hosts (h1.example.com heads with
    ~1/H_n of the mass): rank = floor(exp(u * ln(n_hosts))) for u = stable
    hash of the original url in (0, 1) — inverse-CDF sampling of
    P(rank = r) = ln(1 + 1/r)/ln(n_hosts) ≈ 1/(r ln n_hosts), so rank 1
    heads with ln(2)/ln(n_hosts) of the mass (ceil would be off by one:
    rank 1 could never occur). Test/bench harness for skew stress: builds
    an actually heavy-tailed corpus from any url-keyed table without
    touching payloads or timestamps."""
    u = (F.pmod(F.xxhash64(url_col), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    rank = F.least(
        F.floor(F.exp(u * F.log(F.lit(float(n_hosts))))).cast("int"),
        F.lit(n_hosts),
    )
    return df.withColumn(
        url_col,
        F.concat(
            F.lit("https://h"),
            rank.cast("string"),
            F.lit(".example.com/p/"),
            F.md5(url_col),
        ),
    )


def per_host_counts_two_phase(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    n_salt: int = DEFAULT_N_SALT,
    hot: Optional[List[str]] = None,
    granularity: str = "day",
) -> DataFrame:
    """Skew-safe per-(host, bucket) row counts: partial agg on the salted
    key, final agg on the real key. Output: host, bucket, n_rows."""
    keyed = df.select(
        host_column(url_col).alias("host"),
        time_bucket_column(ts_col, granularity).alias("bucket"),
        salt_column(url_col, hot, n_salt).alias("salt"),
    )
    partial = keyed.groupBy("host", "bucket", "salt").agg(F.count("*").alias("partial_rows"))
    return partial.groupBy("host", "bucket").agg(F.sum("partial_rows").alias("n_rows"))
