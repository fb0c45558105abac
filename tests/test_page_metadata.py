# -*- coding: utf-8 -*-
"""Page-chrome metadata extraction (operators.metadata.page_metadata).

Expectations over the GENERATED pages corpus are analytic — titles and
footers come straight from the datagen template parameters (CLAUDE.md
datagen rule), so the checks here are genuine cross-checks of the
byte-level parse, not replays of the operator."""

from pyspark.sql import functions as F

from dss_plugin_google_cloud_vision_spark.operators.metadata import page_metadata
from dss_plugin_google_cloud_vision_spark.sources.pages import pages_df
from dss_plugin_google_cloud_vision_spark.sources.render import documents_as_pages

N_ROWS = 120


def test_html_pages_title_matches_host_from_url(spark):
    """Datagen writes <title>Site {host}</title>; the host is also the
    url authority — two independent paths to the same value."""
    meta = page_metadata(pages_df(spark, N_ROWS)).withColumn(
        "host", F.regexp_extract("url", "https://([^/]+)/", 1)
    )
    html = meta.filter(F.col("is_html") == 1)
    assert html.count() > 0
    bad = html.filter(
        F.col("title") != F.concat(F.lit("Site "), F.col("host"))
    ).count()
    assert bad == 0


def test_html_pages_link_census_and_footer(spark):
    """Every generated html page carries nav (4-9) + aside farm (5-12)
    anchors — at least 9, and linkfarm pages add 8-15 more (<= 36 total);
    the footer template is unconditional."""
    html = page_metadata(pages_df(spark, N_ROWS)).filter(F.col("is_html") == 1)
    agg = html.agg(
        F.min("n_anchors").alias("lo"),
        F.max("n_anchors").alias("hi"),
        F.min("has_footer").alias("footer_lo"),
    ).head()
    assert 9 <= agg["lo"] <= agg["hi"] <= 36, agg
    assert agg["footer_lo"] == 1


def test_non_html_payloads_get_null_metadata(spark):
    """PDF / junk / empty payloads route to the layout kernels, not the
    metadata parser: is_html = 0 and every metadata column NULL."""
    meta = page_metadata(pages_df(spark, N_ROWS))
    non_html = meta.filter(F.col("is_html") == 0)
    assert non_html.count() > 0  # the 120-row corpus always has pdf rows
    leaked = non_html.filter(
        F.col("title").isNotNull()
        | F.col("n_anchors").isNotNull()
        | F.col("has_footer").isNotNull()
        | F.col("article_chars").isNotNull()
    ).count()
    assert leaked == 0


def test_rendered_corpus_exact_metadata(spark):
    """Rendered pages (documents_as_pages): title = 'doc {id}', the fixed
    5 template anchors, footer present, lead-article chars = escaped text
    length — the driver oracle's analytic predictions, checked per row."""
    docs = spark.createDataFrame(
        [(1, "a & b < c", "en"), (2, "plain words here", "fr")],
        "doc_id bigint, text string, lang string",
    )
    rows = {
        r["doc_id"]: r
        for r in page_metadata(documents_as_pages(docs)).collect()
    }
    assert rows[1]["title"] == "doc 1" and rows[2]["title"] == "doc 2"
    assert rows[1]["n_anchors"] == 5 and rows[1]["has_footer"] == 1
    # 'a & b < c' -> 'a &amp; b &lt; c' (13 chars)
    assert rows[1]["article_chars"] == len("a &amp; b &lt; c")
    assert rows[2]["article_chars"] == len("plain words here")


def test_page_metadata_is_projection_only(spark):
    """Metadata extraction must add ZERO exchanges — it is a pure map
    over bytes the scan already read."""
    plan = (
        page_metadata(pages_df(spark, 32, partitions=4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
