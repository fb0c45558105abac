# -*- coding: utf-8 -*-
"""Fast-tokenizer equivalence suite: the fast engine must produce the SAME
extraction output (text + spans + language) as the stdlib html.parser
engine on (1) every hand fixture, (2) the whole synthetic corpus, (3)
hypothesis-fuzzed arbitrary text, and (4) structured HTML-ish fuzz with
nasty constructs (quoted '>' in attrs, comments, entities, CDATA blocks,
self-closing, bogus tags)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from dss_plugin_google_cloud_vision_spark.functions.html_extract import extract_html
from dss_plugin_google_cloud_vision_spark.sources.pages import expected_page, make_page


def assert_engines_agree(markup: bytes):
    if not markup:
        return  # both engines raise ExtractionError on empty payloads
    fast = extract_html(markup, engine="fast")
    try:
        stdlib = extract_html(markup, engine="stdlib")
    except (NotImplementedError, AssertionError):
        # stdlib _markupbase raises on unknown marked sections
        # (e.g. '<![foo]>'); the fast engine is deliberately total there
        return
    assert fast.text == stdlib.text
    assert fast.spans == stdlib.spans
    assert fast.language_code == stdlib.language_code
    assert fast.language_confidence == stdlib.language_confidence


HAND_CASES = [
    b"<body><article><h2>T heading here</h2><p>A paragraph that is long enough to keep.</p></article></body>",
    b"a < b and <3 hearts but long enough to be a real content block here",
    b"<div foo='>'>quoted gt in attribute with enough text to keep around here</div>",
    b"<!-- comment --><div>after a comment this block is long enough to keep</div>",
    b"<div>ampersands &amp; entities &lt;kept&gt; and &unknown; refs long enough</div>",
    b"<script>var x = '<div>not content</div>';</script><div>real content after script block</div>",
    b"<style>p { color: red }</style><div>real content after the style block here</div>",
    b"<br/><div>self closing break then a content block long enough to keep</div>",
    b"<p/ ><div>odd slash space tag then a content block long enough to keep</div>",
    b"<div unterminated",
    b"<!-- unterminated comment",
    b"<script>never closed anywhere",
    b"</orphan></ div><div>content after orphan end tags long enough to keep</div>",
    b"<?php echo 'x'; ?><div>content after processing instruction long enough</div>",
    b"<!doctype html><div>content after doctype declaration long enough to keep</div>",
    b"<1tag>not a tag but text that is long enough to form a content block here",
    b"<a href=/x/>unquoted attr with slashes then more text long enough to keep</a> trailing tail",
    b"<div a=1 b='two' c=\"three\">mixed attribute quoting with enough text here</div>",
    b"text &amp more text &notarealentity; and &amp; again long enough to keep here",
    b"<DIV CLASS='X'>uppercase tags with enough content text to keep around here</DIV>",
    b"</>empty end tag then content that is long enough to form a block here",
    b"<div><![CDATA[not real cdata in html]]>content long enough to keep here</div>",
    b"<div><![CDATA[gt inside > cdata]]>more content long enough to keep here</div>",
    b"<!-- comment closed with space -- ><div>content after loose comment close</div>",
    b"<script>x</script foo><div>endtag with attrs after script block here</div>",
    b"<script>a</style>b</script><div>wrong close inside cdata stays raw here</div>",
    b"<a href='x>y'>quoted gt in anchor with enough surrounding text to keep</a> tail",
    b"<div\tfoo\n=\n'v'>whitespace soup in attributes with enough text to keep</div>",
]


@pytest.mark.parametrize("markup", HAND_CASES, ids=range(len(HAND_CASES)))
def test_hand_cases(markup):
    assert_engines_agree(markup)


def test_whole_synthetic_corpus():
    for i in range(512):
        expected = expected_page(i)
        if expected["is_error"] or expected["kind"] in ("pdf", "badpdf"):
            continue
        assert_engines_agree(bytes(make_page(i)["html"]))


@settings(max_examples=300, deadline=None)
@given(st.text(min_size=1, max_size=800))
def test_arbitrary_text_equivalence(markup):
    assert_engines_agree(markup.encode("utf-8"))


_TAGS = ["div", "p", "a", "span", "article", "nav", "script", "style", "h2", "li", "br"]
_fragment = st.one_of(
    st.text(alphabet="ab &;<>/!\"'=-x", max_size=12),
    st.sampled_from(
        [
            "<!-- c -->",
            "<!doctype html>",
            "<![CDATA[x]]>",
            "&amp;",
            "&lt;",
            "&notareal",
            "</>",
            "<?pi?>",
            "some longer words to build content blocks from here",
        ]
    ),
    st.builds(
        lambda t, attr, close: f"<{t}{attr}>" if not close else f"</{t}>",
        st.sampled_from(_TAGS),
        st.sampled_from(["", " a=1", " href='/x'", ' c=">"', " b=/x/", "/", " /"]),
        st.booleans(),
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_fragment, min_size=1, max_size=30))
def test_structured_fuzz_equivalence(fragments):
    assert_engines_agree("".join(fragments).encode("utf-8"))
