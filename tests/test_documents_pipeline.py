# -*- coding: utf-8 -*-
"""Explode/merge document path (FIXTURES.md §4) + fused-vs-exploded parity
+ end-to-end pipeline golden check."""

import json
from pathlib import Path

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.functions.response import RESPONSE_DDL
from dss_plugin_google_cloud_vision_spark.operators.documents import (
    extract_split_pages,
    merge_documents,
    split_documents,
)
from dss_plugin_google_cloud_vision_spark.plans.extract_pipeline import run_extraction_pipeline
from dss_plugin_google_cloud_vision_spark.sources.pages import (
    PAGE_SEPARATOR,
    expected_page,
    tiny_pages_df,
)

N_ROWS = 64
GOLDENS = json.loads((Path(__file__).parent / "goldens" / "extraction_goldens.json").read_text())


def test_split_documents_explode(spark):
    df = tiny_pages_df(spark, N_ROWS)
    pages = split_documents(df).cache()
    for i in range(N_ROWS):
        expected = expected_page(i)
        rows = pages.filter(F.col("url") == expected["url"]).collect()
        if expected["kind"] == "pdf":
            assert sorted(r["page_number"] for r in rows) == list(range(1, expected["page_count"] + 1))
        elif expected["kind"] in ("badpdf",):
            assert len(rows) == 1 and rows[0]["page_payload"] is None
        else:
            assert len(rows) == 1 and rows[0]["page_number"] is None
    pages.unpersist()


def test_exploded_path_matches_fused_path(spark):
    df = tiny_pages_df(spark, N_ROWS)
    exploded = extract_split_pages(split_documents(df))
    parsed = exploded.withColumn(
        "t", F.coalesce(F.from_json("document_text_api_response", RESPONSE_DDL)["fullTextAnnotation"]["text"], F.lit(""))
    )
    merged = merge_documents(parsed, text_column="t", page_separator=PAGE_SEPARATOR)
    by_url = {r["url"]: r for r in merged.collect()}
    for i in range(N_ROWS):
        expected = expected_page(i)
        golden = GOLDENS[expected["url"]]
        row = by_url[expected["url"]]
        if not golden["error"]:
            assert row["page_count"] == golden["page_count"]
            import hashlib

            assert hashlib.md5(row["doc_text"].encode()).hexdigest() == golden["doc_md5"], expected["kind"]
        else:
            assert row["doc_text"] == ""


def test_split_error_routed_to_error_columns(spark):
    bad = [i for i in range(N_ROWS) if expected_page(i)["kind"] == "badpdf"]
    assert bad, "fixture should contain at least one unsplittable pdf in 64 rows"
    df = tiny_pages_df(spark, N_ROWS)
    out = extract_split_pages(split_documents(df))
    url = expected_page(bad[0])["url"]
    row = out.filter(F.col("url") == url).collect()[0]
    assert row["document_text_api_response"] == ""
    assert row["document_text_api_error_message"] == "Document could not be split"
    assert (
        row["document_text_api_error_type"]
        == "dss_plugin_google_cloud_vision_spark.errors.DocumentSplitError"
    )


def test_full_pipeline_end_to_end(spark):
    df = tiny_pages_df(spark, N_ROWS)
    plan = run_extraction_pipeline(df)
    pages = plan.pages
    # api columns last, payload dropped, formatted columns present
    assert pages.columns[-3:] == [
        "content_api_response",
        "content_api_error_message",
        "content_api_error_type",
    ]
    assert "html" not in pages.columns
    assert "content_api_detections_concat" in pages.columns
    docs = {r["url"]: r for r in plan.documents.collect()}
    assert len(docs) == N_ROWS
    import hashlib

    for i in range(N_ROWS):
        expected = expected_page(i)
        golden = GOLDENS[expected["url"]]
        if not golden["error"]:
            assert hashlib.md5(docs[expected["url"]]["doc_text"].encode()).hexdigest() == golden["doc_md5"]


def test_pipeline_language_columns(spark):
    df = tiny_pages_df(spark, N_ROWS)
    plan = run_extraction_pipeline(df)
    ok = plan.pages.filter(
        (F.col("content_api_error_message") == "") & (F.col("content_api_detections_concat") != "")
    )
    rows = ok.select("lang", "content_api_language_code", "content_api_language_score").collect()
    assert rows
    detected = [r for r in rows if r["content_api_language_code"] != ""]
    # language id should fire on the vast majority of non-empty texts
    assert len(detected) >= int(0.9 * len(rows))
    for r in detected:
        assert 0.0 < r["content_api_language_score"] <= 1.0


def test_empty_input_guard(spark):
    import pytest as _pytest

    from dss_plugin_google_cloud_vision_spark.plans.extract_pipeline import (
        EmptyInputError,
        run_extraction_pipeline,
    )

    empty = tiny_pages_df(spark, 4).filter("1 = 0")
    with _pytest.raises(EmptyInputError, match="No pages to process"):
        run_extraction_pipeline(empty, check_nonempty=True)
    # default: lazy pipelines tolerate empty inputs
    plan = run_extraction_pipeline(empty)
    assert plan.pages.count() == 0


def test_tiff_exploded_matches_fused(spark):
    """Three-way routing parity: TIFF payloads through the explicit
    split→extract→merge path equal the fused pipeline's document output."""
    from dss_plugin_google_cloud_vision_spark.sources.render import documents_as_tiff_pages

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{i}w{j}" for j in range(12)), "en") for i in range(8)],
        "doc_id long, text string, lang string",
    )
    pages = documents_as_tiff_pages(docs)

    exploded = extract_split_pages(split_documents(pages))
    parsed = exploded.withColumn(
        "t",
        F.coalesce(
            F.from_json("document_text_api_response", RESPONSE_DDL)["fullTextAnnotation"]["text"],
            F.lit(""),
        ),
    )
    merged_explicit = {
        r["url"]: (r["page_count"], r["doc_text"])
        for r in merge_documents(parsed, text_column="t", page_separator=PAGE_SEPARATOR).collect()
    }
    fused = {
        r["url"]: (r["page_count"], r["doc_text"])
        for r in run_extraction_pipeline(pages).documents.collect()
    }
    assert merged_explicit == fused
    assert all(count == 2 for count, _ in fused.values())
    # byte identity: half1 \f half2 of the source text
    for row in docs.collect():
        toks = row["text"].split(" ")
        expected = " ".join(toks[:6]) + PAGE_SEPARATOR + " ".join(toks[6:])
        url = f"https://docs.example.org/en/doc-{row['doc_id']}.tiff"
        assert fused[url][1] == expected


def test_curate_corpus_removes_planted_duplicates(spark):
    """End-to-end curation: exact copies AND near copies (suffix edit)
    collapse to the original; short docs gated out; stats preserved."""
    from dss_plugin_google_cloud_vision_spark.plans.curation import curate_corpus
    from dss_plugin_google_cloud_vision_spark.sources.render import documents_as_pages

    base = " ".join(f"tok{i}" for i in range(30))
    other = " ".join(f"w{i} and the river market stone".split()[i % 5] + str(i) for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, base, "en"),
            (2, other, "en"),
            (3, "too short", "en"),  # gated out (< 20 tokens)
            (101, base, "en"),  # exact copy of 1
            (102, base + " zzz extra suffix token", "en"),  # near copy of 1
        ],
        "doc_id long, text string, lang string",
    )
    curated = curate_corpus(documents_as_pages(docs))
    rows = {r["doc_id"]: r for r in curated.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["text"] == base  # byte-identical through extraction
    assert rows[1]["n_tokens"] == 30
