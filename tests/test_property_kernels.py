# -*- coding: utf-8 -*-
"""Property-based tests (hypothesis) for the extraction kernels: the
extractor must be total over arbitrary UTF-8 input (html.parser leniency),
spans must always be consistent with the output text, and split/merge must
round-trip. No Spark — pure kernel properties."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dss_plugin_google_cloud_vision_spark.errors import (
    DocumentSplitError,
    ExtractionError,
)
from dss_plugin_google_cloud_vision_spark.functions.html_extract import extract_html
from dss_plugin_google_cloud_vision_spark.functions.langid import (
    LANG_STOPWORDS,
    SCRIPT_RANGES,
    guess_language,
)
from dss_plugin_google_cloud_vision_spark.functions.pdf_extract import (
    merge_pdf_pages,
    split_pdf_pages,
)
from dss_plugin_google_cloud_vision_spark.operators.pages import extract_document
from dss_plugin_google_cloud_vision_spark.sources.pages import expected_page, make_page

VALID_CODES = set(LANG_STOPWORDS) | {code for code, _, _ in SCRIPT_RANGES} | {""}


@settings(max_examples=150, deadline=None)
@given(st.text(min_size=1, max_size=2000))
def test_extractor_total_over_arbitrary_text(markup):
    """Any UTF-8 text (however broken as HTML) either extracts or raises
    ExtractionError — never crashes, never emits inconsistent spans."""
    payload = markup.encode("utf-8")
    result = extract_html(payload)
    for kind, start, end, block_id in result.spans:
        assert 0 <= start <= end <= len(result.text)
        piece = result.text[start:end]
        assert piece == piece.strip()
        assert kind in ("heading", "paragraph")
    # determinism
    again = extract_html(payload)
    assert again.text == result.text and again.spans == result.spans


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=1, max_size=512))
def test_extract_document_total_over_binary(payload):
    """Arbitrary bytes: either pages come back or a captured error type is
    raised — exactly the two outcomes the extraction stage handles."""
    try:
        results = extract_document(payload)
    except (ExtractionError, DocumentSplitError):
        return
    assert results
    for page_number, response in results:
        parsed = json.loads(response)
        assert "fullTextAnnotation" in parsed


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=500))
def test_langid_contract(text):
    code, confidence = guess_language(text)
    assert code in VALID_CODES
    assert 0.0 <= confidence <= 1.0


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=0, max_value=5000))
def test_datagen_pdf_round_trip(i):
    expected = expected_page(i)
    if expected["kind"] != "pdf":
        return
    payload = make_page(i)["html"]
    pages = split_pdf_pages(payload)
    assert len(pages) == expected["page_count"]
    assert merge_pdf_pages(pages) == bytes(payload)


@settings(max_examples=120, deadline=None)
@given(st.integers(min_value=0, max_value=100000))
def test_datagen_total_and_consistent(i):
    """Every row id, at any scale, generates and (if not an error row)
    extracts to exactly its analytic expectation."""
    expected = expected_page(i)
    page = make_page(i)
    if expected["is_error"]:
        return
    results = extract_document(page["html"])
    texts = [json.loads(r)["fullTextAnnotation"]["text"] for _, r in results]
    assert texts == expected["page_texts"]


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(blacklist_characters="\n", blacklist_categories=("Cs",)),
                min_size=1,
                max_size=40,
            ).filter(lambda s: s not in ("ENDFRAME", "%%EOFTIFF") and not s.startswith("FRAME ")),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_tiff_build_split_merge_round_trip(frames):
    """Property: build → split → merge is the identity, and per-frame
    extraction recovers every line verbatim with correct span offsets."""
    from dss_plugin_google_cloud_vision_spark.functions.tiff_extract import (
        build_tiff_payload,
        extract_tiff_frame,
        merge_tiff_frames,
        split_tiff_frames,
    )

    payload = build_tiff_payload(frames)
    parts = split_tiff_frames(payload)
    assert len(parts) == len(frames)
    assert merge_tiff_frames(parts) == payload
    for ordinal, (part, lines) in enumerate(zip(parts, frames), start=1):
        frame = extract_tiff_frame(part)
        assert frame.frame_number == ordinal
        assert frame.text == "\n".join(lines)
        for span, line in zip(frame.spans, lines):
            assert frame.text[span[1] : span[2]] == line


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 5),
    st.integers(1, 12),
    st.integers(1, 15),
    st.integers(0, 2**32 - 1),
)
def test_avi_codec_round_trip_property(n, h, w, seed):
    """encode_avi -> decode_avi is the identity for ANY frame geometry
    (incl. widths whose 3-byte rows need DIB padding) and any content."""
    import numpy as np

    from dss_plugin_google_cloud_vision_spark.functions.video import (
        avi_frame_offsets,
        decode_avi,
        encode_avi,
    )

    rng = np.random.RandomState(seed % 2**31)
    frames = rng.randint(0, 256, size=(n, h, w, 3)).astype(np.uint8)
    payload = encode_avi(frames, fps=1 + seed % 60)
    back, fps = decode_avi(payload)
    assert back.shape == frames.shape and (back == frames).all()
    assert fps >= 1
    offsets, gw, gh, _f = avi_frame_offsets(payload)
    assert len(offsets) == n and (gw, gh) == (w, h)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_avi_decode_total_over_binary(payload):
    """decode_avi never crashes with anything but VideoDecodeError on
    arbitrary bytes (totality — the error-column contract upstream)."""
    from dss_plugin_google_cloud_vision_spark.functions.video import (
        VideoDecodeError,
        decode_avi,
    )

    try:
        decode_avi(payload)
    except VideoDecodeError:
        pass


@settings(max_examples=12, deadline=None)  # each example is 2 Spark jobs
@given(
    st.sampled_from(["http", "https", "HTTPS", "Http"]),
    st.text(alphabet="aBcD.-09", min_size=1, max_size=12),
    st.sampled_from(["", ":80", ":443", ":8080"]),
    st.lists(
        st.sampled_from(["a=1", "b=2", "Z=9", "utm_x=1", "gclid=7", "ref=h", ""]),
        max_size=5,
    ),
    st.sampled_from(["", "#frag", "#a#b"]),
)
def test_url_canonicalization_idempotent(scheme, host, port, params, frag):
    """canonical(canonical(u)) == canonical(u) for structured URLs —
    canonicalization must be a projection (checked via the batch op on a
    shared local session)."""
    url = f"{scheme}://{host}{port}/P/q"
    if params:
        url += "?" + "&".join(params)
    url += frag
    from dss_plugin_google_cloud_vision_spark.operators.urls import canonicalize_urls
    from dss_plugin_google_cloud_vision_spark.session import get_spark

    spark = get_spark(cores=2)
    df = spark.createDataFrame([(url,)], "url string")
    once = canonicalize_urls(df).collect()[0]["canonical_url"]
    twice = canonicalize_urls(
        spark.createDataFrame([(once,)], "url string")
    ).collect()[0]["canonical_url"]
    assert once == twice
