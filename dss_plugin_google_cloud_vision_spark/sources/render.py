# -*- coding: utf-8 -*-
"""Render the driver-provided ``documents`` table into the pages shape —
entirely with JVM-side column expressions (no Python UDF).

This gives the correctness harness a *pages* table whose ground-truth
extraction is known analytically (the article body IS ``documents.text``),
so the full extraction pipeline becomes oracle-checkable in plain SQL:
byte-identical recovery of ``text`` per ``doc_id`` is the north rule's
byte-identity invariant expressed as a DuckDB-verifiable query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EPOCH_SECONDS = 1704067200  # 2024-01-01T00:00:00Z

_TEMPLATE = (
    "<!DOCTYPE html><html><head><title>doc %s</title>"
    "<style>body {margin: 0}</style></head><body>"
    '<header><h1>Site docs.example.org</h1><nav><ul>'
    '<li><a href="/">home</a></li><li><a href="/about">about</a></li>'
    '<li><a href="/contact">contact</a></li></ul></nav></header>'
    '<div class="content"><article><p>%s</p></article></div>'
    '<aside><ul><li><a href="/r1">a related link with a long anchor text</a></li>'
    '<li><a href="/r2">another related link with long anchor text</a></li></ul></aside>'
    "<footer><p>copyright docs.example.org all rights reserved</p></footer>"
    "</body></html>"
)


def _escape_html(col: Column) -> Column:
    """Minimal HTML escaping (& first), inverted by the extractor's
    entity decoding — keeps the identity invariant even if text carries
    markup characters."""
    escaped = F.regexp_replace(col, "&", "&amp;")
    escaped = F.regexp_replace(escaped, "<", "&lt;")
    return F.regexp_replace(escaped, ">", "&gt;")


def documents_as_pdf_pages(documents: DataFrame) -> DataFrame:
    """documents → pages whose payloads are TWO-PAGE ``%PDF-`` layout
    documents with blocks emitted OUT of reading order: page 1 holds the
    first two thirds of the text as two blocks written y-reversed, page 2
    the last third. Ground truth (SQL-computable): page-1 text =
    part1 || '\\n' || part2 (layout sort restores order), document text =
    page1 || '\\f' || page2."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n1 = F.floor(n / 3).cast("int")
    n2 = F.floor(n / 3).cast("int")
    part1 = F.array_join(F.slice(toks, 1, n1), " ")
    part2 = F.array_join(F.slice(toks, n1 + 1, n2), " ")
    part3 = F.array_join(F.slice(toks, n1 + n2 + 1, n - n1 - n2), " ")
    payload = F.format_string(
        "%%PDF-FAKE 1.0\nPAGE 1\n"
        "BLOCK id=1 y=200 x=0\n%s\nENDBLOCK\n"
        "BLOCK id=0 y=100 x=0\n%s\nENDBLOCK\n"
        "ENDPAGE\nPAGE 2\n"
        "BLOCK id=2 y=0 x=0\n%s\nENDBLOCK\n"
        "ENDPAGE\n%%%%EOF\n",
        part2,
        part1,
        part3,
    )
    return documents.select(
        F.format_string("https://docs.example.org/%s/doc-%s.pdf", F.col("lang"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_SECONDS) + F.col("doc_id") * 137).alias("warc_ts"),
        F.encode(payload, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def documents_as_tiff_pages(documents: DataFrame) -> DataFrame:
    """documents → pages whose payloads are TWO-FRAME ``II*\\x00`` (TIFF
    little-endian magic) containers: frame 1 holds the first half of the
    text, frame 2 the rest, one OCR line each. Ground truth
    (SQL-computable): document text = half1 || '\\f' || half2. Exercises
    the engine's third routing branch (pdf / tiff / html — the reference's
    three-way suffix routing, google_vision_api_formatting.py:412-418)."""
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n1 = F.floor(n / 2).cast("int")
    half1 = F.array_join(F.slice(toks, 1, n1), " ")
    half2 = F.array_join(F.slice(toks, n1 + 1, n - n1), " ")
    payload = F.format_string(
        "II*\x00FAKE 1.0\nFRAME 1\n%s\nENDFRAME\nFRAME 2\n%s\nENDFRAME\n%%%%EOFTIFF\n",
        half1,
        half2,
    )
    return documents.select(
        F.format_string("https://docs.example.org/%s/doc-%s.tiff", F.col("lang"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_SECONDS) + F.col("doc_id") * 137).alias("warc_ts"),
        F.encode(payload, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )


def documents_as_pages(documents: DataFrame, error_mod: int = 0) -> DataFrame:
    """documents(doc_id, text, lang, ...) → pages(url, warc_ts, html, text,
    lang, doc_id). With ``error_mod`` > 0, every ``doc_id % error_mod == 0``
    row gets an empty payload — a deterministic error-path subset whose
    size is SQL-computable by the oracle."""
    html_string = F.format_string(_TEMPLATE, F.col("doc_id"), _escape_html(F.col("text")))
    html = F.encode(html_string, "UTF-8")
    if error_mod > 0:
        html = F.when(F.col("doc_id") % error_mod == 0, F.lit(b"")).otherwise(html)
    return documents.select(
        F.format_string("https://docs.example.org/%s/doc-%s.html", F.col("lang"), F.col("doc_id")).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_SECONDS) + F.col("doc_id") * 137).alias("warc_ts"),
        html.alias("html"),
        F.col("text"),
        F.col("lang"),
        F.col("doc_id"),
    )
