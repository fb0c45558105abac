# -*- coding: utf-8 -*-
"""Batch sessionization semantics on crafted timelines."""

import random
from datetime import datetime, timedelta

from dss_plugin_google_cloud_vision_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _events(spark):
    rows = [
        # user 1: two sessions split by a >1h gap; a tie on ts broken by id
        (1, 1, datetime(2024, 1, 1, 10, 0, 0)),
        (2, 1, datetime(2024, 1, 1, 10, 0, 0)),
        (3, 1, datetime(2024, 1, 1, 10, 30, 0)),
        (4, 1, datetime(2024, 1, 1, 12, 0, 1)),  # 5401s gap → new session
        # user 2: one session, boundary gap exactly == threshold stays
        (5, 2, datetime(2024, 1, 1, 9, 0, 0)),
        (6, 2, datetime(2024, 1, 1, 10, 0, 0)),  # exactly 3600s → same session
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")


def test_sessionize_boundaries(spark):
    out = sessionize(_events(spark), gap_seconds=3600)
    seqs = {r["event_id"]: r["session_seq"] for r in out.collect()}
    assert seqs == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1, 6: 1}


def test_session_stats_counts(spark):
    stats = {
        (r["user_id"], r["session_seq"]): r
        for r in session_stats(_events(spark), gap_seconds=3600).collect()
    }
    assert stats[(1, 1)]["n_events"] == 3
    assert stats[(1, 2)]["n_events"] == 1
    assert stats[(2, 1)]["n_events"] == 2
    # exact epoch-micro bounds
    assert stats[(2, 1)]["start_us"] == 1704099600000000
    assert stats[(2, 1)]["end_us"] == 1704103200000000


def test_sessionize_matches_python_reference_on_random_events(spark):
    """Seeded randomized cross-check: Spark sessionization equals a naive
    single-threaded Python sessionizer on 300 random events."""
    rng = random.Random(20240816)
    base = datetime(2024, 1, 1)
    rows = []
    for event_id in range(300):
        user = rng.randrange(6)
        ts = base + timedelta(seconds=rng.randrange(0, 14 * 24 * 3600))
        rows.append((event_id, user, ts))
    gap = 3600 * 4

    # python reference: per user, sort by (ts, id), split on gap
    expected = {}
    per_user = {}
    for event_id, user, ts in rows:
        per_user.setdefault(user, []).append((ts, event_id))
    for user, evts in per_user.items():
        evts.sort()
        seq, last = 0, None
        for ts, event_id in evts:
            if last is None or (ts - last).total_seconds() > gap:
                seq += 1
            expected[event_id] = (user, seq)
            last = ts

    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz")
    got = {
        r["event_id"]: (r["user_id"], r["session_seq"])
        for r in sessionize(df, gap_seconds=gap).collect()
    }
    assert got == expected
