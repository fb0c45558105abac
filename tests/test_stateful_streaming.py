# -*- coding: utf-8 -*-
"""Stateful streaming scoreboard: after consuming all arrivals across two
AvailableNow runs with a shared checkpoint, the per-host state must equal
the batch aggregate over everything."""

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages
from dss_plugin_google_cloud_vision_spark.sources.pages import PAGES_DDL, iter_pages, pages_df
from dss_plugin_google_cloud_vision_spark.streaming.stateful import (
    host_state_batch_equivalent,
    host_state_stream,
)


def _write_increment(spark, input_dir, start, end):
    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
        for p in iter_pages(start, end)
    ]
    spark.createDataFrame(rows, PAGES_DDL).coalesce(1).write.mode("append").parquet(input_dir)


def _run_stream(spark, input_dir, out_dir, checkpoint):
    pages = spark.readStream.schema(PAGES_DDL).format("parquet").option("path", input_dir).load()
    extracted = extract_pages(pages, drop_payload=True)
    scoreboard = host_state_stream(extracted, "content_api_response")
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    query = (
        scoreboard.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .outputMode("update")
        .start()
    )
    query.awaitTermination(300)


def test_host_state_converges_to_batch_aggregate(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "scoreboard")
    checkpoint = str(tmp_path / "ckpt")

    _write_increment(spark, input_dir, 0, 40)
    _run_stream(spark, input_dir, out_dir, checkpoint)
    _write_increment(spark, input_dir, 40, 64)
    _run_stream(spark, input_dir, out_dir, checkpoint)

    # latest state per host (update-mode rows appended per micro-batch →
    # take the row with max pages_seen per host)
    emitted = spark.read.parquet(out_dir)
    latest = {
        r["host"]: r
        for r in emitted.orderBy("pages_seen").collect()  # last write wins below
    }

    clean = extract_pages(
        spark.read.parquet(input_dir), drop_payload=True
    )
    expected = {r["host"]: r for r in host_state_batch_equivalent(clean, "content_api_response").collect()}

    assert set(latest) == set(expected)
    for host, exp in expected.items():
        got = latest[host]
        assert got["pages_seen"] == exp["pages_seen"], host
        assert got["success_count"] == exp["success_count"], host
        assert got["error_count"] == exp["error_count"], host
        assert got["last_seen"] == exp["last_seen"], host


def test_streaming_sessionize_converges_to_batch(spark, tmp_path, sf_dir):
    """Closed sessions emitted across two AvailableNow runs (shared
    checkpoint; time-split increments so open sessions must survive in the
    state store) equal the batch sessionization minus each user's final
    still-open session."""
    from dss_plugin_google_cloud_vision_spark.operators.sessions import session_stats
    from dss_plugin_google_cloud_vision_spark.streaming.sessionize import session_state_stream

    events = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("user_id") < 8)
    cut = "2024-01-15 00:00:00"
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "sessions")
    checkpoint = str(tmp_path / "ckpt")
    events.filter(F.col("ts") < cut).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = (
            spark.readStream.schema(events.schema).format("parquet").option("path", input_dir).load()
        )
        closed = session_state_stream(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        query = (
            closed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        query.awaitTermination(300)

    run()
    events.filter(F.col("ts") >= cut).coalesce(1).write.mode("append").parquet(input_dir)
    run()

    emitted = {
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.read.parquet(out_dir).collect()
    }
    all_sessions = session_stats(events).collect()
    last_seq = {}
    for row in all_sessions:
        last_seq[row["user_id"]] = max(last_seq.get(row["user_id"], 0), row["session_seq"])
    expected_closed = {
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in all_sessions
        if r["session_seq"] != last_seq[r["user_id"]]
    }
    assert emitted == expected_closed
    assert len(emitted) > 0


def test_streaming_sessionize_event_time_timeout(spark, tmp_path):
    """Idle sessions flush via event-time timeout: a user with no further
    events is closed once OTHER keys' events advance the watermark past
    last_event + gap (no closing event needed)."""
    from datetime import datetime

    from dss_plugin_google_cloud_vision_spark.streaming.sessionize import session_state_stream

    schema = "event_id long, user_id long, ts timestamp_ntz"
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "closed")
    checkpoint = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()
        closed = session_state_stream(stream, gap_seconds=21600, event_time_timeout=True)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            closed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    # run 1: user 1 (2 events, will go idle) and user 2 (2 events)
    write([(1, 1, t(0)), (2, 1, t(0, 30)), (3, 2, t(0)), (4, 2, t(1))])
    run()
    # run 2: only user 2 returns, 10h later → user 2's first session closes
    # by the gap rule; the batch advances the watermark to 10:00
    write([(5, 2, t(10))])
    run()
    # run 3: an unrelated key's event triggers a batch; user 1 is idle and
    # its timeout (00:30 + 6h = 06:30) < watermark (10:00) → flushed
    write([(6, 3, t(20))])
    run()

    emitted = {
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.read.parquet(out_dir).collect()
    }
    us = lambda h, m=0: (1704067200 + h * 3600 + m * 60) * 1_000_000  # noqa: E731
    assert (2, 2, us(0), us(1)) in emitted  # user 2 session 1, gap-closed
    assert (1, 2, us(0), us(0, 30)) in emitted  # user 1, timeout-flushed
    # run 3's own event advances the watermark to 20:00 and AvailableNow
    # runs a trailing timeout batch: user 2's idle session (timeout 16:00)
    # flushes as well; user 3 (timeout 26:00) stays open in state
    assert (2, 1, us(10), us(10)) in emitted
    assert len(emitted) == 3


def test_streaming_sessionize_key_spanning_many_arrow_chunks(spark, tmp_path):
    """A key whose micro-batch rows span many Arrow chunks must still fold
    in global time order (code-review regression: per-chunk sorting)."""
    from datetime import datetime, timedelta

    from dss_plugin_google_cloud_vision_spark.streaming.sessionize import session_state_stream

    base = datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        # 7h gap between event 199 and 200 → exactly two sessions
        offset = timedelta(minutes=i) if i < 200 else timedelta(hours=7, minutes=i)
        rows.append((i, 1, base + offset))
    # shuffle deterministically so chunk order ≠ time order
    rows.sort(key=lambda r: (r[0] * 2654435761) % 997)
    schema = "event_id long, user_id long, ts timestamp_ntz"
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "closed")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(input_dir)

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
    try:
        stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()
        closed = session_state_stream(stream, gap_seconds=21600)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            closed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    emitted = [
        (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
        for r in spark.read.parquet(out_dir).collect()
    ]
    epoch = 1704067200 * 1_000_000
    assert emitted == [(1, 200, epoch, epoch + 199 * 60 * 1_000_000)]


def test_streaming_sessionize_event_time_timeout_non_utc(spark, tmp_path):
    """The event-time timeout no longer requires a UTC session timezone:
    the timeout rides the CAST watermark column's own epoch while session
    bounds stay NTZ wall-clock — same emitted rows under
    America/New_York."""
    from datetime import datetime

    from dss_plugin_google_cloud_vision_spark.streaming.sessionize import session_state_stream

    schema = "event_id long, user_id long, ts timestamp_ntz"
    t = lambda h, m=0: datetime(2024, 1, 1, h, m)  # noqa: E731
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "closed")
    checkpoint = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()
        closed = session_state_stream(stream, gap_seconds=21600, event_time_timeout=True)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            closed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    original_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        write([(1, 1, t(0)), (2, 1, t(0, 30)), (3, 2, t(0)), (4, 2, t(1))])
        run()
        write([(5, 2, t(10))])
        run()
        write([(6, 3, t(20))])
        run()
        emitted = {
            (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
            for r in spark.read.parquet(out_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", original_tz)
    us = lambda h, m=0: (1704067200 + h * 3600 + m * 60) * 1_000_000  # noqa: E731
    assert (2, 2, us(0), us(1)) in emitted
    assert (1, 2, us(0), us(0, 30)) in emitted
    assert (2, 1, us(10), us(10)) in emitted
    assert len(emitted) == 3


def test_streaming_exact_dedup_across_batches_and_restarts(spark, tmp_path):
    """Built-in stateful dropDuplicates over the text fingerprint: the
    first arrival of each distinct text is emitted exactly once — within
    a micro-batch, across micro-batches, and across job RESTARTS (state
    lives in the checkpoint); output equals batch keep-first when arrival
    order is id order."""
    from dss_plugin_google_cloud_vision_spark.streaming.dedup import stream_exact_dedup

    schema = "doc_id long, text string"
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()
        deduped = stream_exact_dedup(stream)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            deduped.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    write([(1, "alpha one"), (2, "beta two"), (3, "alpha one")])  # in-batch dup
    run()
    write([(4, "beta two"), (5, "gamma three")])  # cross-RESTART dup + fresh
    run()
    rows = spark.read.parquet(out_dir).collect()
    kept = {r["doc_id"] for r in rows}
    assert kept == {1, 2, 5}
    # the emitted _fp column matches the batch dedup fingerprint
    fps = {r["doc_id"]: r["_fp"] for r in rows}
    import hashlib

    assert fps[5] == hashlib.md5(b"gamma three").hexdigest()


def test_streaming_and_batch_dedup_mutually_resumable(spark, tmp_path):
    """The _fp column contract: a corpus written by the STREAMING dedup
    can be extended by the BATCH incremental dedup — texts already
    ingested by the stream are recognized and skipped."""
    from dss_plugin_google_cloud_vision_spark.operators.dedup import incremental_exact_dedup
    from dss_plugin_google_cloud_vision_spark.streaming.dedup import stream_exact_dedup

    schema = "doc_id long, text string"
    input_dir = str(tmp_path / "in")
    corpus_dir = str(tmp_path / "corpus")
    checkpoint = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "alpha one"), (2, "beta two")], schema
    ).coalesce(1).write.mode("append").parquet(input_dir)
    stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()

    # foreachBatch plain-parquet sink: the default streaming file sink
    # writes a _spark_metadata log that HIDES files appended later by
    # batch jobs (documented in streaming.dedup) — a batch-extendable
    # corpus must be written without it
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(corpus_dir)

    q = (
        stream_exact_dedup(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination(300)

    inc = spark.createDataFrame(
        [(10, "alpha one"), (11, "gamma three")], schema  # 10 = cross-mode dup
    )
    n = incremental_exact_dedup(spark, inc, corpus_dir, return_corpus_size=True)
    assert n == 3
    kept = {r["doc_id"] for r in spark.read.parquet(corpus_dir).collect()}
    assert kept == {1, 2, 11}


def test_streaming_sessionize_across_dst_fall_back(spark, tmp_path):
    """Event-time timeout across the America/New_York 2024-11-03 fall-back
    (the repeated 01:00-02:00 wall hour): session bounds stay NTZ
    wall-clock arithmetic, and the max()-folded watermark clock never
    regresses, so sessions close exactly as in any other night."""
    from datetime import datetime

    from dss_plugin_google_cloud_vision_spark.streaming.sessionize import session_state_stream

    schema = "event_id long, user_id long, ts timestamp_ntz"
    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "closed")
    checkpoint = str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = spark.readStream.schema(schema).format("parquet").option("path", input_dir).load()
        closed = session_state_stream(stream, gap_seconds=21600, event_time_timeout=True)

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out_dir)

        q = (
            closed.writeStream.foreachBatch(sink)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    t = lambda h, m=0: datetime(2024, 11, 3, h, m)  # noqa: E731
    original_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # events inside and across the repeated hour
        write([(1, 1, t(0, 30)), (2, 1, t(1, 30)), (3, 1, t(2, 15))])
        run()
        write([(4, 1, t(12, 0))])  # > 6h NTZ gap after 02:15 -> closes session
        run()
        write([(5, 2, t(23, 0))])  # watermark far ahead -> flushes user 1's open session
        run()
        emitted = {
            (r["user_id"], r["n_events"], r["start_us"], r["end_us"])
            for r in spark.read.parquet(out_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.session.timeZone", original_tz)
    # 2024-11-03 00:00 as a UTC-interpreted NTZ epoch (session bounds are
    # pure wall-clock micros, independent of the session timezone)
    us = lambda h, m=0: (1730592000 + h * 3600 + m * 60) * 1_000_000  # noqa: E731
    assert (1, 3, us(0, 30), us(2, 15)) in emitted
    assert (1, 1, us(12), us(12)) in emitted
    assert len(emitted) == 2


def test_windowed_host_counts_watermark_semantics(spark, tmp_path):
    """Event-time windowed aggregation (windowed_host_counts) across three
    AvailableNow runs sharing a checkpoint: append mode emits a window only
    after the PERSISTED watermark passes its end; events older than the
    watermark are dropped; still-open windows are withheld. Matches the
    batch event_windows oracle shape on the surviving events."""
    from datetime import datetime

    from dss_plugin_google_cloud_vision_spark.streaming.stream_extract import (
        windowed_host_counts,
    )

    input_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    def ts(hour, minute=0):
        return datetime(2024, 3, 5, hour, minute)

    def write_rows(rows):
        spark.createDataFrame(
            [(f"https://{host}/p{i}", when, b"", "t", "en") for i, (host, when) in enumerate(rows)],
            PAGES_DDL,
        ).coalesce(1).write.mode("append").parquet(input_dir)

    def run():
        stream = windowed_host_counts(spark, input_dir, window="1 hour", watermark="2 hours")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .outputMode("append")
            .start()
        )
        q.awaitTermination(300)

    def emitted():
        try:
            return {
                (r["window_start"].hour, r["host"]): r["n_pages"]
                for r in spark.read.parquet(out_dir).collect()
            }
        except Exception:
            return {}

    # run 1: five events in the 10:00 window -> watermark ends at 08:40,
    # nothing closes, nothing emitted
    write_rows([("a", ts(10, 10)), ("a", ts(10, 20)), ("a", ts(10, 30)),
                ("b", ts(10, 15)), ("b", ts(10, 40))])
    run()
    assert emitted() == {}

    # run 2: 14:05 advances the watermark to 12:05 (closes 10:00); the
    # 07:30 arrival is OLDER than the persisted 08:40 watermark -> dropped
    write_rows([("a", ts(14, 5)), ("b", ts(7, 30))])
    run()
    out2 = emitted()
    assert out2 == {(10, "a"): 3, (10, "b"): 2}, out2

    # run 3: 18:00 advances the watermark past 15:00 -> the 14:00 window
    # closes with only the on-time event; the dropped 07:30 never surfaces
    write_rows([("c", ts(18, 0))])
    run()
    out3 = emitted()
    assert out3 == {(10, "a"): 3, (10, "b"): 2, (14, "a"): 1}, out3


def test_stream_curation_converges_to_batch_and_dedups_across_runs(spark, tmp_path):
    """The streaming curator (extract -> gopher gate -> exact dedup) across
    two AvailableNow runs — the second re-delivering already-seen texts as
    new files — must end with exactly the batch-curated distinct corpus:
    same fingerprint set, no duplicate admitted, errors and gate-failures
    excluded."""
    from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages_typed
    from dss_plugin_google_cloud_vision_spark.operators.textstats import gopher_columns
    from dss_plugin_google_cloud_vision_spark.streaming.curation import (
        stream_curate_available_now,
    )

    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    _write_increment(spark, input_dir, 0, 48)
    q = stream_curate_available_now(spark, input_dir, output_dir, checkpoint, min_words=40)
    q.awaitTermination(300)
    first = spark.read.parquet(output_dir)
    n_first = first.count()
    assert n_first > 0

    # wave 2: 16 NEW docs + the first 16 docs AGAIN as fresh files
    _write_increment(spark, input_dir, 48, 64)
    _write_increment(spark, input_dir, 0, 16)
    q = stream_curate_available_now(spark, input_dir, output_dir, checkpoint, min_words=40)
    q.awaitTermination(300)
    final = spark.read.parquet(output_dir)

    # batch equivalent over everything ever written (64 distinct docs)
    batch_pages = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in iter_pages(0, 64)],
        PAGES_DDL,
    )
    typed = extract_pages_typed(batch_pages).filter(F.col("error_type") == "")
    gate = gopher_columns(min_words=40)
    expected = (
        typed.select(F.col("extracted_text").alias("text"))
        .filter(gate["keep"] == 1)
        .select(F.md5("text").alias("_fp"))
        .distinct()
    )
    got_fps = {r["_fp"] for r in final.select("_fp").collect()}
    want_fps = {r["_fp"] for r in expected.collect()}
    assert got_fps == want_fps
    # exactly once: no fingerprint admitted twice across waves
    assert final.count() == len(got_fps)
    # gate is real: some extracted docs were rejected
    assert len(want_fps) < 64
