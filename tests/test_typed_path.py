# -*- coding: utf-8 -*-
"""Typed scale path: extract_pages_typed must agree field-for-field with
the reference-contract JSON path on the whole tiny corpus."""

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.functions.response import RESPONSE_DDL
from dss_plugin_google_cloud_vision_spark.operators.pages import (
    extract_pages,
    extract_pages_typed,
)
from dss_plugin_google_cloud_vision_spark.sources.pages import tiny_pages_df

N_ROWS = 64


def test_typed_path_agrees_with_json_path(spark):
    df = tiny_pages_df(spark, N_ROWS)

    typed = extract_pages_typed(df).select(
        "url", "page_number", "extracted_text", "spans", "language_code", "language_score",
        "error_message", "error_type",
    )
    json_path = extract_pages(df, drop_payload=True)
    parsed = json_path.withColumn("p", F.from_json("content_api_response", RESPONSE_DDL)).select(
        "url",
        "page_number",
        F.col("p.fullTextAnnotation.text").alias("extracted_text"),
        F.flatten(
            F.transform(
                F.coalesce(F.col("p.fullTextAnnotation.pages"), F.array()),
                lambda page: F.coalesce(page["blocks"], F.array()),
            )
        ).alias("blocks"),
        F.try_element_at(
            F.col("p.fullTextAnnotation.pages")[0]["property"]["detectedLanguages"], F.lit(1)
        ).alias("lang"),
        F.col("content_api_error_message").alias("error_message"),
        F.col("content_api_error_type").alias("error_type"),
    )

    typed_rows = {(r["url"], r["page_number"]): r for r in typed.collect()}
    json_rows = {(r["url"], r["page_number"]): r for r in parsed.collect()}
    assert set(typed_rows) == set(json_rows)
    for key, t in typed_rows.items():
        j = json_rows[key]
        assert t["error_message"] == j["error_message"]
        assert t["error_type"] == j["error_type"]
        if t["error_message"]:
            assert t["extracted_text"] is None
            continue
        assert t["extracted_text"] == j["extracted_text"]
        expected_code = j["lang"]["languageCode"] if j["lang"] else ""
        assert t["language_code"] == expected_code
        t_spans = [(s["kind"], s["start"], s["end"], s["block_id"]) for s in (t["spans"] or [])]
        j_spans = [
            (b["blockType"], b["charSpan"]["start"], b["charSpan"]["end"], b["blockId"])
            for b in (j["blocks"] or [])
        ]
        assert t_spans == j_spans


def test_typed_path_no_shuffle(spark):
    out = extract_pages_typed(tiny_pages_df(spark, 16))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
