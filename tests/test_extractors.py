# -*- coding: utf-8 -*-
"""Kernel tests for the HTML/PDF extractors (no Spark) — the byte-identity
surface. Hand-written fixtures with hand-computed expected text, plus the
datagen cross-check: the generator's analytically-computed expected output
must equal what the extractor actually produces, for every synthetic row."""

import json

import pytest

from dss_plugin_google_cloud_vision_spark.errors import DocumentSplitError, ExtractionError
from dss_plugin_google_cloud_vision_spark.functions.html_extract import extract_html
from dss_plugin_google_cloud_vision_spark.functions.langid import guess_language
from dss_plugin_google_cloud_vision_spark.functions.pdf_extract import (
    extract_pdf_page,
    is_pdf_payload,
    merge_pdf_pages,
    split_pdf_pages,
)
from dss_plugin_google_cloud_vision_spark.operators.pages import extract_document
from dss_plugin_google_cloud_vision_spark.sources.pages import (
    PAGE_SEPARATOR,
    expected_page,
    make_page,
)

ARTICLE_HTML = b"""<html><head><title>T</title><style>p {}</style></head><body>
<header><h1>My Site</h1><nav><a href="/">Home</a> <a href="/b">Blog</a></nav></header>
<article><h2>A Fine Day</h2><p>This is the main paragraph of the page, long enough to keep.</p>
<p>Second   paragraph with    odd whitespace
and a newline.</p></article>
<aside><ul><li><a href="/x">some long related link text here</a></li></ul></aside>
<footer><p>copyright me</p></footer>
</body></html>"""

ARTICLE_EXPECTED = (
    "A Fine Day"
    "\n\nThis is the main paragraph of the page, long enough to keep."
    "\n\nSecond paragraph with odd whitespace and a newline."
)


def test_html_article_extraction_exact():
    result = extract_html(ARTICLE_HTML)
    assert result.text == ARTICLE_EXPECTED


def test_html_spans_cover_blocks():
    result = extract_html(ARTICLE_HTML)
    assert [s[0] for s in result.spans] == ["heading", "paragraph", "paragraph"]
    for kind, start, end, block_id in result.spans:
        piece = result.text[start:end]
        assert "\n\n" not in piece and piece == piece.strip()
    assert result.text[result.spans[0][1] : result.spans[0][2]] == "A Fine Day"


def test_html_inline_anchor_kept_link_block_dropped():
    html = (
        b"<body><div><p>Read the <a href='/m'>manual</a> for details that are long enough"
        b" to pass the threshold.</p></div>"
        b"<div><a href='/x'>all of this text is just one long link</a></div></body>"
    )
    result = extract_html(html)
    assert result.text == "Read the manual for details that are long enough to pass the threshold."


def test_html_short_blocks_outside_article_dropped():
    html = b"<body><div>too short</div><div>this block is definitely long enough to keep around</div></body>"
    result = extract_html(html)
    assert result.text == "this block is definitely long enough to keep around"


def test_html_truncated_markup_is_lenient():
    html = b"<body><article><p>A perfectly reasonable paragraph that never closes"
    result = extract_html(html)
    assert result.text == "A perfectly reasonable paragraph that never closes"


def test_html_error_paths():
    with pytest.raises(ExtractionError):
        extract_html(b"")
    with pytest.raises(ExtractionError):
        extract_html(b"\xff\xfe\x00junk")


PDF_PAYLOAD = (
    b"%PDF-FAKE 1.0\n"
    b"PAGE 1\n"
    b"BLOCK id=1 y=200 x=0\nsecond in reading order\nENDBLOCK\n"
    b"BLOCK id=0 y=100 x=0\nfirst in reading order\nENDBLOCK\n"
    b"ENDPAGE\n"
    b"PAGE 2\n"
    b"BLOCK id=2 y=0 x=80\nright column\nENDBLOCK\n"
    b"BLOCK id=3 y=0 x=0\nleft column\nENDBLOCK\n"
    b"ENDPAGE\n"
    b"%%EOF\n"
)


def test_pdf_split_and_layout_order():
    pages = split_pdf_pages(PDF_PAYLOAD)
    assert len(pages) == 2
    page1 = extract_pdf_page(pages[0])
    assert page1.page_number == 1
    assert page1.text == "first in reading order\nsecond in reading order"
    page2 = extract_pdf_page(pages[1])
    assert page2.text == "left column\nright column"  # same y → sort by x


def test_pdf_merge_round_trip():
    pages = split_pdf_pages(PDF_PAYLOAD)
    assert merge_pdf_pages(pages) == PDF_PAYLOAD
    assert is_pdf_payload(PDF_PAYLOAD)


def test_pdf_split_error():
    with pytest.raises(DocumentSplitError):
        split_pdf_pages(b"%PDF-FAKE 1.0\nno pages here\n")


def test_langid_scripts_and_stopwords():
    code, conf = guess_language("the cat and the dog went to the market of the town")
    assert code == "en" and conf > 0
    code, _ = guess_language("中文文本内容很长")
    assert code == "zh"
    assert guess_language("") == ("", 0.0)


def test_extract_document_kernel():
    results = extract_document(PDF_PAYLOAD)
    assert [page_number for page_number, _ in results] == [1, 2]
    response = json.loads(results[0][1])
    assert response["fullTextAnnotation"]["text"] == "first in reading order\nsecond in reading order"
    html_results = extract_document(ARTICLE_HTML)
    assert len(html_results) == 1 and html_results[0][0] is None


N_GOLDEN = 256


def test_datagen_cross_check():
    """The generator's analytic expectation equals real extractor output for
    every synthetic row kind — text AND page numbering AND error routing."""
    for i in range(N_GOLDEN):
        expected = expected_page(i)
        page = make_page(i)
        assert page["url"] == expected["url"]
        if expected["is_error"]:
            with pytest.raises((ExtractionError, DocumentSplitError)):
                extract_document(page["html"])
            continue
        results = extract_document(page["html"])
        texts = [json.loads(r)["fullTextAnnotation"]["text"] for _, r in results]
        assert texts == expected["page_texts"], (i, expected["kind"])
        assert PAGE_SEPARATOR.join(texts) == expected["doc_text"] == page["text"]
        if expected["kind"] == "pdf":
            assert [pn for pn, _ in results] == list(range(1, expected["page_count"] + 1))


def test_extraction_is_deterministic():
    for i in (0, 7, 23):
        page = make_page(i)
        if expected_page(i)["is_error"]:
            continue
        first = extract_document(page["html"])
        assert all(extract_document(page["html"]) == first for _ in range(3))


TIFF_PAYLOAD = (
    b"II*\x00FAKE 1.0\n"
    b"FRAME 1\n"
    b"the quick brown fox\n"
    b"jumps over the lazy dog\n"
    b"ENDFRAME\n"
    b"FRAME 2\n"
    b"a second scanned frame\n"
    b"ENDFRAME\n"
    b"%%EOFTIFF\n"
)


def test_tiff_split_and_line_spans():
    from dss_plugin_google_cloud_vision_spark.functions.tiff_extract import (
        extract_tiff_frame,
        split_tiff_frames,
    )

    frames = split_tiff_frames(TIFF_PAYLOAD)
    assert len(frames) == 2
    frame1 = extract_tiff_frame(frames[0])
    assert frame1.frame_number == 1
    assert frame1.text == "the quick brown fox\njumps over the lazy dog"
    assert frame1.spans == [("line", 0, 19, 0), ("line", 20, 43, 1)]
    assert frame1.language_code == "en"
    frame2 = extract_tiff_frame(frames[1])
    assert frame2.frame_number == 2
    assert frame2.text == "a second scanned frame"


def test_tiff_merge_round_trip():
    from dss_plugin_google_cloud_vision_spark.functions.tiff_extract import (
        is_tiff_payload,
        merge_tiff_frames,
        split_tiff_frames,
    )

    frames = split_tiff_frames(TIFF_PAYLOAD)
    assert merge_tiff_frames(frames) == TIFF_PAYLOAD
    assert is_tiff_payload(TIFF_PAYLOAD)
    assert not is_tiff_payload(PDF_PAYLOAD)
    assert not is_pdf_payload(TIFF_PAYLOAD)


def test_tiff_split_error():
    import pytest

    from dss_plugin_google_cloud_vision_spark.errors import DocumentSplitError
    from dss_plugin_google_cloud_vision_spark.functions.tiff_extract import split_tiff_frames

    with pytest.raises(DocumentSplitError):
        split_tiff_frames(b"II*\x00FAKE 1.0\nno frames here\n")


def test_three_way_routing():
    """P3 generality: one kernel call routes pdf / tiff / html payloads
    (reference google_vision_api_formatting.py:412-418 routes three ways
    on suffix; we route on magic bytes)."""
    from dss_plugin_google_cloud_vision_spark.operators.pages import extract_document_typed

    tiff_pages = extract_document_typed(TIFF_PAYLOAD)
    assert [p[0] for p in tiff_pages] == [1, 2]
    assert tiff_pages[0][1].startswith("the quick brown fox")
    pdf_pages = extract_document_typed(PDF_PAYLOAD)
    assert [p[0] for p in pdf_pages] == [1, 2]
    html_pages = extract_document_typed(
        b"<html><body><article><p>plain html body text that is long enough to keep"
        b" for the extractor heuristics to retain it as main content</p></article></body></html>"
    )
    assert [p[0] for p in html_pages] == [None]


def test_malformed_multipage_payloads_raise():
    """A PAGE/FRAME opened while the previous one is unterminated is a
    split error, not a silent mis-split (code-review regression)."""
    import pytest

    from dss_plugin_google_cloud_vision_spark.errors import DocumentSplitError
    from dss_plugin_google_cloud_vision_spark.functions.tiff_extract import (
        build_tiff_payload,
        split_tiff_frames,
    )

    with pytest.raises(DocumentSplitError):
        split_pdf_pages(b"%PDF-FAKE 1.0\nPAGE 1\nPAGE 2\nx\nENDPAGE\n%%EOF\n")
    with pytest.raises(DocumentSplitError):
        split_tiff_frames(b"II*\x00FAKE 1.0\nFRAME 1\nFRAME 2\nx\nENDFRAME\n%%EOFTIFF\n")
    # marker-colliding content is rejected at build time, not corrupted
    with pytest.raises(ValueError):
        build_tiff_payload([["ENDFRAME"]])
    with pytest.raises(ValueError):
        build_tiff_payload([["a\nb"]])
