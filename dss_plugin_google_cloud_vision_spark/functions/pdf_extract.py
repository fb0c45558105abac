# -*- coding: utf-8 -*-
"""Deterministic layout parsing for PDF-like binary payloads.

The reference splits real PDFs/TIFFs into per-page files with PyPDF2/PIL
(reference: python-lib/document_utils.py:69-129), sends each page to the
Vision API, and re-merges pages by ordinal
(reference: python-lib/document_utils.py:320-377). Real PDF decode
libraries are not available in this environment, so the binary-payload
branch is exercised with a deterministic, trivially-parseable layout format
(``%PDF-`` magic preserved so content-type routing is realistic — the
reference routes on filename suffix, python-lib/
google_vision_api_formatting.py:412-418; we route on the magic bytes).

Format (line-oriented, UTF-8):

    %PDF-FAKE 1.0
    PAGE 1
    BLOCK id=<int> y=<int> x=<int>
    <one line of block text>
    ENDBLOCK
    ...
    ENDPAGE
    PAGE 2
    ...
    %%EOF

The *layout* part is genuine: blocks appear in arbitrary order within a
page and carry (y, x) coordinates; page text is reassembled in reading
order — sort by (y, x, block id) — which is what a real PDF layout parser
must do. Page split and merge round-trip losslessly.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple, Tuple

from ..errors import DocumentSplitError, ExtractionError
from .html_extract import decode_payload
from .langid import guess_language
from .response import Span

PDF_MAGIC = b"%PDF-"
FAKE_HEADER = "%PDF-FAKE 1.0"
EOF_MARKER = "%%EOF"
LINE_SEPARATOR = "\n"

_BLOCK_RE = re.compile(r"^BLOCK id=(\d+) y=(-?\d+) x=(-?\d+)$")
_PAGE_RE = re.compile(r"^PAGE (\d+)$")


def is_pdf_payload(payload: bytes) -> bool:
    """Content-type sniff on magic bytes — our analogue of the reference's
    pdf/tiff suffix routing (google_vision_api_formatting.py:412-418)."""
    return payload is not None and bytes(payload[:5]) == PDF_MAGIC


def split_pdf_pages(payload: bytes) -> List[bytes]:
    """Split a multi-page payload into standalone single-page payloads
    (the reference's ``split_document``, document_utils.py:131-156).
    Raises ``DocumentSplitError`` when the payload carries the PDF magic
    but no parseable page structure (document_utils.py:152-156 analogue)."""
    text = decode_payload(payload)
    lines = text.split(LINE_SEPARATOR)
    if not lines or not lines[0].startswith("%PDF-"):
        raise DocumentSplitError("not a PDF payload")
    pages: List[List[str]] = []
    current: List[str] = None
    for line in lines[1:]:
        if _PAGE_RE.match(line):
            if current is not None:
                raise DocumentSplitError("PAGE while previous page unterminated")
            current = [line]
            pages.append(current)
        elif line == "ENDPAGE":
            if current is None:
                raise DocumentSplitError("ENDPAGE without PAGE")
            current.append(line)
            current = None
        elif line == EOF_MARKER:
            break
        elif current is not None:
            current.append(line)
    if len(pages) == 0 or current is not None:
        raise DocumentSplitError("document could not be split")
    return [
        (LINE_SEPARATOR.join([FAKE_HEADER] + page_lines + [EOF_MARKER]) + LINE_SEPARATOR).encode("utf-8")
        for page_lines in pages
    ]


def merge_pdf_pages(page_payloads: List[bytes]) -> bytes:
    """Reassemble single-page payloads into one document (the reference's
    ``_merge_pdf``, document_utils.py:212-242)."""
    if not page_payloads:
        raise ValueError("No files to merge")
    merged_lines = [FAKE_HEADER]
    for payload in page_payloads:
        lines = decode_payload(payload).split(LINE_SEPARATOR)
        body = [ln for ln in lines if ln not in ("", FAKE_HEADER, EOF_MARKER)]
        merged_lines.extend(body)
    merged_lines.append(EOF_MARKER)
    return (LINE_SEPARATOR.join(merged_lines) + LINE_SEPARATOR).encode("utf-8")


class PdfPageExtraction(NamedTuple):
    page_number: int
    text: str
    spans: List[Span]
    language_code: str
    language_confidence: float


def extract_pdf_page(page_payload: bytes) -> PdfPageExtraction:
    """Parse one single-page payload into reading-order text + spans.

    Blocks are sorted by (y, x, id) — layout reading order — regardless of
    their order in the payload; block texts are joined with a newline.
    """
    text = decode_payload(page_payload)
    lines = text.split(LINE_SEPARATOR)
    page_number = None
    blocks: List[Tuple[int, int, int, str]] = []
    current_header = None
    current_text: List[str] = []
    for line in lines:
        page_match = _PAGE_RE.match(line)
        if page_match:
            page_number = int(page_match.group(1))
            continue
        block_match = _BLOCK_RE.match(line)
        if block_match:
            current_header = tuple(int(g) for g in block_match.groups())  # (id, y, x)
            current_text = []
            continue
        if line == "ENDBLOCK":
            if current_header is None:
                raise ExtractionError("ENDBLOCK without BLOCK")
            block_id, y, x = current_header
            blocks.append((y, x, block_id, " ".join(current_text).strip()))
            current_header = None
            continue
        if current_header is not None:
            current_text.append(line)
    if page_number is None:
        raise ExtractionError("page payload without PAGE header")
    blocks.sort()
    spans: List[Span] = []
    parts: List[str] = []
    offset = 0
    for _, _, block_id, block_text in blocks:
        if parts:
            offset += len(LINE_SEPARATOR)
        start = offset
        end = start + len(block_text)
        spans.append(("layout_block", start, end, block_id))
        parts.append(block_text)
        offset = end
    page_text = LINE_SEPARATOR.join(parts)
    code, confidence = guess_language(page_text)
    return PdfPageExtraction(
        page_number=page_number,
        text=page_text,
        spans=spans,
        language_code=code,
        language_confidence=confidence,
    )
