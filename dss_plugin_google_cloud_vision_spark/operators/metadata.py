# -*- coding: utf-8 -*-
"""HTML page metadata extraction — the metadata half of a
trafilatura-style web extractor (title, link census, footer flag,
lead-article size), as ONE codegen projection over the decoded payload.

The main-content half (boilerplate-stripped text) is
``operators.pages``; this surface answers the corpus-curation questions
that need the page's *chrome* rather than its body: titles for
document naming and near-dup grouping, anchor density as a
link-spam / navigation-page signal (Boilerpipe's link-density cue at
page grain), footer presence as a template marker.

Everything is built from ``pyspark.sql.functions`` string primitives on
the decoded payload — no Python UDF, no shuffle, whole-stage codegen
keeps it inside the scan projection. At 100 TB this matters: metadata
extraction is a pure map over the page bytes the scan already read, so
it adds zero exchanges to whatever plan consumes it (plan-asserted in
tests/test_plan_quality.py).

Reference parity note: the reference plugin carries per-image metadata
through ``content_api_response`` JSON and formats it column-wise
(python-lib/google_vision_api_formatting.py:200-260); this is the same
"typed columns out of an opaque payload" move applied to HTML chrome.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ANCHOR_NEEDLE = "<a href="
_TITLE_RE = "<title>([^<]*)</title>"
_LEAD_ARTICLE_RE = "<article><p>([^<]*)</p></article>"


def _occurrences(col: Column, needle: str) -> Column:
    """Occurrence count via length arithmetic — stays in codegen. The
    numerator is an exact multiple of len(needle), so the floor is exact."""
    diff = F.length(col) - F.length(F.replace(col, F.lit(needle), F.lit("")))
    return F.floor(diff / F.lit(len(needle))).cast("int")


def page_metadata(
    pages: DataFrame,
    html_col: str = "html",
) -> DataFrame:
    """Append page-chrome metadata columns to ``pages``.

    Output columns (NULL on non-HTML payloads — PDF/TIFF magic routes to
    the layout kernels, not here):

    - ``is_html``        1 when the decoded payload opens with an HTML
                         preamble (``<!DOCTYPE`` or ``<html``)
    - ``title``          first ``<title>`` element's text ('' if absent)
    - ``n_anchors``      count of ``<a href=`` openings (link census;
                         anchors-per-body-char is the page-grain
                         link-density spam signal)
    - ``has_footer``     1 when a ``<footer>`` element exists
    - ``article_chars``  char length of the lead single-paragraph
                         ``<article>`` body (0 when the page's article
                         is multi-paragraph — callers wanting full body
                         text use the extraction kernel, not metadata)
    """
    # cast(binary as string), NOT decode(): Spark 4's decode raises
    # MALFORMED_CHARACTER_CODING on invalid UTF-8 (junk/truncated crawl
    # payloads must flow to is_html=0, never fail the task); the cast is
    # lenient (U+FFFD replacement), matching crawl-robustness semantics
    dec = F.col(html_col).cast("string")
    out = pages.withColumn("_dec", dec).withColumn(
        "is_html",
        (F.col("_dec").startswith("<!DOCTYPE") | F.col("_dec").startswith("<html"))
        .cast("int"),
    )
    html_only = F.col("is_html") == 1
    return (
        out.withColumn(
            "title",
            F.when(html_only, F.regexp_extract(F.col("_dec"), _TITLE_RE, 1)),
        )
        .withColumn(
            "n_anchors", F.when(html_only, _occurrences(F.col("_dec"), _ANCHOR_NEEDLE))
        )
        .withColumn(
            "has_footer",
            F.when(html_only, F.col("_dec").contains("<footer>").cast("int")),
        )
        .withColumn(
            "article_chars",
            F.when(
                html_only,
                F.length(F.regexp_extract(F.col("_dec"), _LEAD_ARTICLE_RE, 1)).cast(
                    "int"
                ),
            ),
        )
        .drop("_dec")
    )
