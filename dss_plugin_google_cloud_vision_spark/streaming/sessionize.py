# -*- coding: utf-8 -*-
"""Stateful streaming sessionization via ``applyInPandasWithState``.

The streaming form of ``operators.sessions``: per key, the state holds the
open session (start, last-seen, event count); an arriving event whose gap
to the last-seen exceeds the threshold CLOSES the open session (emitted
downstream) and opens a new one. Output mode: append — only closed
sessions are emitted; open sessions live in the state store and survive
restarts via the checkpoint.

Ordering note: each key's rows for a micro-batch are CONCATENATED across
their Arrow chunks and sorted by (ts, tie-break) once before folding;
cross-micro-batch reordering is the usual streaming caveat and is handled
in production by watermarking the source —
the engine's tests drive the operator with AvailableNow over a static
input (single ordered fold), then assert closed sessions equal the batch
``sessionize`` result minus each key's still-open final session.

Checkpoint compatibility: ``STATE_SCHEMA`` grew a 4th field
(``last_wm_us``) when event-time timeouts landed. ``_read_state`` tolerates
a 3-tuple coming back (defaults the watermark clock to 0), but Spark's own
state-store schema checker may reject a pre-upgrade checkpoint at the JVM
layer before Python sees it — restarting an OLD checkpoint against this
version may require a fresh ``checkpointLocation`` (open sessions in the
old state are then lost; they re-open from their next event).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sessions import DEFAULT_GAP_SECONDS, epoch_micros

STATE_SCHEMA = "start_us long, last_us long, n_events long, last_wm_us long"


def _read_state(state: GroupState) -> Tuple[Any, Any, int, int]:
    """Decode persisted state, tolerating the pre-``last_wm_us`` 3-field
    layout: a checkpoint written before the schema grew its 4th field
    decodes as a 3-tuple (or with a null 4th slot) — default the watermark
    clock to 0 instead of failing the restart. (State written by THIS
    version always carries 4 fields.)"""
    values = tuple(state.get)
    start_us, last_us, n_events = values[0], values[1], values[2]
    last_wm_us = values[3] if len(values) > 3 and values[3] is not None else 0
    return start_us, last_us, int(n_events), int(last_wm_us)


def _make_update_fn(gap_seconds: int, event_time_timeout: bool):
    gap_us = int(gap_seconds) * 1_000_000

    def update(
        key: Tuple[Any, ...],
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if event_time_timeout and state.hasTimedOut:
            # idle flush: the watermark passed the open session's end + gap
            # with no new events for this key — close it and drop state
            start_us, last_us, n_events, _last_wm = _read_state(state)
            state.remove()
            yield pd.DataFrame(
                [(user_id, n_events, start_us, last_us)],
                columns=["user_id", "n_events", "start_us", "end_us"],
            )
            return
        if state.exists:
            start_us, last_us, n_events, last_wm_us = _read_state(state)
        else:
            start_us = last_us = None
            n_events = 0
            last_wm_us = 0
        closed = []
        # the group's rows arrive as MULTIPLE pandas chunks in arbitrary
        # cross-chunk order — concatenate before sorting (sorting each
        # chunk independently would fold events out of time order for any
        # key larger than one Arrow batch)
        chunks = [pdf for pdf in batches if len(pdf)]
        if chunks:
            ordered = pd.concat(chunks).sort_values(["ts_us", "event_id"])
            has_wm = "wm_us" in ordered.columns
            for row_ts, row_wm in zip(
                ordered["ts_us"], ordered["wm_us"] if has_wm else ordered["ts_us"]
            ):
                ts_us = int(row_ts)
                if last_us is not None and ts_us - last_us > gap_us:
                    closed.append((user_id, n_events, start_us, last_us))
                    start_us, n_events = ts_us, 0
                if start_us is None:
                    start_us = ts_us
                last_us = ts_us
                if has_wm:
                    # max(): the NTZ→TZ cast is non-monotone across a DST
                    # fall-back; the timeout clock must never move backward
                    last_wm_us = max(last_wm_us, int(row_wm))
                n_events += 1
        state.update((start_us, last_us, n_events, last_wm_us))
        if event_time_timeout and last_us is not None:
            # the timeout is set on the WATERMARK clock (tz-aware epoch of
            # the cast column) — session bounds stay NTZ wall-clock, so
            # non-UTC session timezones work
            state.setTimeoutTimestamp(last_wm_us // 1000 + int(gap_seconds) * 1000)
        if closed:
            yield pd.DataFrame(closed, columns=["user_id", "n_events", "start_us", "end_us"])

    return update


def session_state_stream(
    events_stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    event_time_timeout: bool = False,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionizer: emits one row per CLOSED session.

    With ``event_time_timeout=True`` the input is watermarked on
    ``ts_col`` and a session with no successor event also flushes once the
    watermark passes ``last_event + gap`` (idle keys would otherwise hold
    state forever); a closing event and an idle timeout produce the SAME
    session row.

    Output column ``user_id`` carries the key (its type follows
    ``key_col``); ``order_col`` breaks timestamp ties deterministically."""
    key_type = dict(events_stream.dtypes)[key_col]
    output_schema = f"user_id {key_type}, n_events long, start_us long, end_us long"
    source = events_stream
    timeout = GroupStateTimeout.NoTimeout
    if event_time_timeout:
        # the watermark clock is TIMESTAMP (tz-aware) while session epochs
        # are NTZ wall-clock; the timeout stamp is derived from the CAST
        # watermark column's own epoch (``wm_us``), so any session timezone
        # works — the two clocks are kept separate instead of assumed equal
        source = source.withColumn("_wm_ts", F.col(ts_col).cast("timestamp")).withWatermark(
            "_wm_ts", watermark_delay
        )
        timeout = GroupStateTimeout.EventTimeTimeout
    keyed = source.select(
        F.col(key_col).alias("user_id"),
        F.col(order_col).alias("event_id"),
        epoch_micros(F.col(ts_col)).alias("ts_us"),
        *(
            [F.col("_wm_ts"), F.unix_micros(F.col("_wm_ts")).alias("wm_us")]
            if event_time_timeout
            else []
        ),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_update_fn(gap_seconds, event_time_timeout),
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
