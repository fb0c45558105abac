# -*- coding: utf-8 -*-
"""Watermarked windowed streaming aggregation: host counts per warc_ts
window must equal the batch equivalent."""

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.sources.pages import pages_df
from dss_plugin_google_cloud_vision_spark.streaming.stream_extract import (
    windowed_host_counts,
)


def test_windowed_host_counts_matches_batch(spark, tmp_path):
    input_dir = str(tmp_path / "in")
    pages_df(spark, 96, partitions=3).write.parquet(input_dir)

    stream = windowed_host_counts(spark, input_dir, window="1 hour", watermark="2 hours")
    query = (
        stream.writeStream.format("memory")
        .queryName("host_windows")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(300)
    got = {
        (r["window_start"], r["host"]): r["n_pages"]
        for r in spark.sql("select * from host_windows").collect()
    }

    batch = (
        spark.read.parquet(input_dir)
        .groupBy(
            F.window("warc_ts", "1 hour").alias("w"),
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(F.col("w.start").alias("window_start"), "host", "n_pages")
    )
    expected = {(r["window_start"], r["host"]): r["n_pages"] for r in batch.collect()}
    assert got == expected
    assert sum(got.values()) == 96
