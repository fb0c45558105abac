# -*- coding: utf-8 -*-
"""Custom stateful streaming operator: incremental per-host crawl state.

``applyInPandasWithState`` keeps, per host, a running (pages_seen,
success_count, error_count, last_seen_ts) record across micro-batches —
the streaming form of the per-partition E4 metrics: a continuously
maintained extraction scoreboard per host, usable for politeness decisions
(stop crawling hosts with high error rates) without any external store.

Batch-mode equivalent (for oracle checking): a plain groupBy aggregation —
the operator's correctness test asserts that after consuming all
micro-batches, the final state equals the batch aggregate.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "pages_seen long, success_count long, error_count long, last_seen long"
OUTPUT_SCHEMA = (
    "host string, pages_seen long, success_count long, error_count long, last_seen timestamp"
)


def _update_host_state(
    key: Tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """State update function: fold this micro-batch's page rows for one
    host into the running counts and emit the updated scoreboard row."""
    (host,) = key
    if state.exists:
        pages_seen, success_count, error_count, last_seen = state.get
    else:
        pages_seen = success_count = error_count = 0
        last_seen = 0
    for pdf in batches:
        pages_seen += len(pdf)
        ok = pdf["response"].astype(str) != ""
        success_count += int(ok.sum())
        error_count += int((~ok).sum())
        if len(pdf):
            batch_max = pdf["ts_long"].max()
            last_seen = max(last_seen, int(batch_max))
    state.update((pages_seen, success_count, error_count, last_seen))
    yield pd.DataFrame(
        {
            "host": [host],
            "pages_seen": [pages_seen],
            "success_count": [success_count],
            "error_count": [error_count],
            "last_seen": [pd.Timestamp(last_seen, unit="us", tz="UTC")],
        }
    )


def host_state_stream(extracted_stream: DataFrame, response_column: str) -> DataFrame:
    """Streaming per-host scoreboard over extracted page rows. Input: a
    streaming DataFrame with at least (url, warc_ts, <response_column>).
    Output mode: update (one refreshed row per host per micro-batch)."""
    keyed = extracted_stream.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col(response_column).alias("response"),
        (F.unix_micros(F.col("warc_ts"))).alias("ts_long"),
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _update_host_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def host_state_batch_equivalent(extracted: DataFrame, response_column: str) -> DataFrame:
    """The batch aggregate the streaming state must converge to."""
    keyed = extracted.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.col(response_column).alias("response"),
        F.col("warc_ts"),
    )
    return keyed.groupBy("host").agg(
        F.count("*").alias("pages_seen"),
        F.sum(F.when(F.col("response") != "", 1).otherwise(0)).alias("success_count"),
        F.sum(F.when(F.col("response") == "", 1).otherwise(0)).alias("error_count"),
        F.max("warc_ts").alias("last_seen"),
    )
