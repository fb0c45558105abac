# -*- coding: utf-8 -*-
"""Multimodal plumbing tests (schema/batch-shape/determinism/error capture)
and streaming exactly-once extraction tests."""

import pytest
from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.multimodal import (
    FEATURE_BINS,
    extract_media_features,
    resize_image_stub,
    sample_video_frames,
    synthetic_media_df,
)
from dss_plugin_google_cloud_vision_spark.sources.pages import pages_df
from dss_plugin_google_cloud_vision_spark.streaming.stream_extract import (
    stream_extract_available_now,
)


def test_media_features_schema_and_determinism(spark):
    media = synthetic_media_df(spark, 24)
    out = extract_media_features(media)
    assert out.schema["features"].dataType.simpleString() == "array<double>"
    rows1 = {r["media_id"]: r["features"] for r in out.collect()}
    rows2 = {r["media_id"]: r["features"] for r in extract_media_features(media.repartition(5)).collect()}
    assert rows1 == rows2
    for features in rows1.values():
        assert len(features) == FEATURE_BINS
        assert abs(sum(features) - 1.0) < 1e-9  # normalized histogram


def test_media_features_error_capture(spark):
    media = spark.createDataFrame(
        [(1, "image", b"", None), (2, "image", b"\x01\x02\x03", None)],
        "media_id bigint, kind string, payload binary, meta struct<mime:string,width:int,height:int,duration_ms:int>",
    )
    rows = {r["media_id"]: r for r in extract_media_features(media).collect()}
    assert rows[1]["features"] is None and rows[1]["feature_error"] != ""
    assert rows[2]["features"] is not None and rows[2]["feature_error"] == ""


def test_media_strict_mode_marks_stub(spark):
    media = synthetic_media_df(spark, 3)
    with pytest.raises(Exception) as excinfo:
        extract_media_features(media, strict=True).collect()
    assert "NotImplementedError" in str(excinfo.value) or "stubbed" in str(excinfo.value)


def test_frame_sampling_fanout(spark):
    media = synthetic_media_df(spark, 9).filter(F.col("kind") == "video")
    n_videos = media.count()
    frames = sample_video_frames(media, n_frames=4)
    assert frames.count() == n_videos * 4
    one = frames.filter(F.col("frame_index") == 3).collect()[0]
    assert 0 < one["frame_offset"] < len(one["payload"])
    resized = resize_image_stub(media)
    assert resized.select("resized_meta.width").collect()[0][0] == 224


def test_streaming_exactly_once(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    checkpoint = str(tmp_path / "ckpt")

    # increment 1: 32 docs
    pages_df(spark, 32, partitions=2).write.mode("append").parquet(input_dir)
    q = stream_extract_available_now(spark, input_dir, output_dir, checkpoint)
    q.awaitTermination(300)
    first = spark.read.parquet(output_dir)
    urls_first = {r["url"] for r in first.select("url").distinct().collect()}
    assert len(urls_first) == 32

    # increment 2: 16 more docs (ids 32..47) land as new files
    import pyarrow  # noqa: F401

    from dss_plugin_google_cloud_vision_spark.sources.pages import iter_pages

    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
        for p in iter_pages(32, 48)
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.mode("append").parquet(input_dir)

    q2 = stream_extract_available_now(spark, input_dir, output_dir, checkpoint)
    q2.awaitTermination(300)
    final = spark.read.parquet(output_dir)
    # every url exactly the rows a clean run would produce — nothing doubled
    per_url = final.groupBy("url").count()
    from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages

    clean = extract_pages(
        spark.read.parquet(input_dir), drop_payload=True
    ).groupBy("url").count()
    got = {r["url"]: r["count"] for r in per_url.collect()}
    expected = {r["url"]: r["count"] for r in clean.collect()}
    assert got == expected
    assert len(got) == 48
