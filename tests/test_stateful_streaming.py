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
