# -*- coding: utf-8 -*-
"""End-to-end tests for the fused page-extraction Spark stage: row fan-out,
error routing, golden byte-identity per url, and partitioning invariance
(the distributed analogue of the reference's completion-order insensitivity,
parallelizer.py:237-241)."""

import hashlib
import json
from pathlib import Path

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.functions.response import RESPONSE_DDL
from dss_plugin_google_cloud_vision_spark.operators.extract import extraction_metrics
from dss_plugin_google_cloud_vision_spark.operators.pages import extract_pages
from dss_plugin_google_cloud_vision_spark.sources.pages import (
    PAGE_SEPARATOR,
    expected_page,
    pages_df,
    tiny_pages_df,
)

N_ROWS = 64
GOLDENS = json.loads((Path(__file__).parent / "goldens" / "extraction_goldens.json").read_text())


def _extracted_by_url(df):
    """url → (page_count, doc_text, error_type) from the extracted page rows."""
    parsed = df.withColumn("parsed", F.from_json("content_api_response", RESPONSE_DDL))
    rows = (
        parsed.groupBy("url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.coalesce(F.col("page_number"), F.lit(0)).alias("pn"),
                                F.col("parsed.fullTextAnnotation.text").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ),
                PAGE_SEPARATOR,
            ).alias("doc_text"),
            F.count("*").alias("n_rows"),
            F.max("content_api_error_type").alias("error_type"),
        )
        .collect()
    )
    return {r["url"]: r for r in rows}


def test_stage_against_goldens(spark):
    df = tiny_pages_df(spark, N_ROWS)
    out = extract_pages(df, drop_payload=True)
    assert "html" not in out.columns
    by_url = _extracted_by_url(out)
    assert len(by_url) == N_ROWS
    for i in range(N_ROWS):
        expected = expected_page(i)
        golden = GOLDENS[expected["url"]]
        row = by_url[expected["url"]]
        if golden["error"]:
            assert row["error_type"] in (
                "dss_plugin_google_cloud_vision_spark.errors.ExtractionError",
                "dss_plugin_google_cloud_vision_spark.errors.DocumentSplitError",
            ), expected["kind"]
            assert row["n_rows"] == 1
        else:
            assert row["n_rows"] == golden["page_count"]
            assert hashlib.md5(row["doc_text"].encode()).hexdigest() == golden["doc_md5"], expected["kind"]


def test_stage_partitioning_invariance(spark):
    df = tiny_pages_df(spark, N_ROWS)
    reference = _extracted_by_url(extract_pages(df.coalesce(1)))
    for n_parts in (3, 16):
        other = _extracted_by_url(extract_pages(df.repartition(n_parts)))
        assert set(other) == set(reference)
        for url, row in reference.items():
            assert other[url]["doc_text"] == row["doc_text"]
            assert other[url]["n_rows"] == row["n_rows"]


def test_stage_metrics_and_page_numbers(spark):
    df = tiny_pages_df(spark, N_ROWS)
    out = extract_pages(df).cache()
    expected_errors = sum(1 for i in range(N_ROWS) if expected_page(i)["is_error"])
    expected_pages = sum(max(expected_page(i)["page_count"], 1) for i in range(N_ROWS))
    metrics = extraction_metrics(out, "content_api_response").collect()[0]
    assert metrics["num_error"] == expected_errors
    assert metrics["num_rows"] == expected_pages
    pdf_rows = out.filter(F.col("page_number").isNotNull())
    assert pdf_rows.filter(F.col("page_number") < 1).count() == 0
    out.unpersist()


def test_distributed_datagen_matches_driver_side(spark):
    driver_side = {r["url"]: r for r in tiny_pages_df(spark, 32).collect()}
    distributed = {r["url"]: r for r in pages_df(spark, 32, partitions=5).collect()}
    assert set(driver_side) == set(distributed)
    for url in driver_side:
        assert bytes(driver_side[url]["html"]) == bytes(distributed[url]["html"])
        assert driver_side[url]["text"] == distributed[url]["text"]


def test_no_shuffle_in_extraction_plan(spark):
    df = pages_df(spark, 32, partitions=4)
    out = extract_pages(df, drop_payload=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
