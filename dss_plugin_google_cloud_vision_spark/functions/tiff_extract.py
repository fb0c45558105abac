# -*- coding: utf-8 -*-
"""Deterministic frame parsing for TIFF-like multi-page binary payloads.

The reference's document path routes THREE ways — pdf / tif+tiff / other
(reference: python-lib/google_vision_api_formatting.py:412-418;
python-lib/document_utils.py:144-151) — and splits TIFFs frame-by-frame
with PIL ``seek`` (``_split_tiff``, document_utils.py:98-129) then
re-merges with ``append_images`` (``_merge_tiff``, document_utils.py:
244-276). Real image codecs are not available in this environment, so the
second multi-page format is exercised with a deterministic frame container
carrying the REAL little-endian TIFF magic (``II*\\x00``) so the engine's
magic-byte routing (pdf / tiff / html) mirrors the reference's three-way
suffix routing.

Format (line-oriented, UTF-8; first line carries the magic):

    II*\\x00FAKE 1.0
    FRAME 1
    <one or more lines of frame text>
    ENDFRAME
    FRAME 2
    ...
    %%EOFTIFF

Unlike the PDF-analogue there are no layout coordinates — a TIFF frame is
a scanned image whose OCR lines arrive in reading order already — so frame
text is the frame's lines joined by newlines, with one ``line`` span per
line. Frame split and merge round-trip losslessly.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

from ..errors import DocumentSplitError
from .html_extract import decode_payload
from .langid import guess_language
from .response import Span

TIFF_MAGIC = b"II*\x00"
FAKE_HEADER = "II*\x00FAKE 1.0"
EOF_MARKER = "%%EOFTIFF"
LINE_SEPARATOR = "\n"

_FRAME_RE = re.compile(r"^FRAME (\d+)$")


def is_tiff_payload(payload: bytes) -> bool:
    """Content-type sniff on the little-endian TIFF magic — the analogue of
    the reference's ``endswith(("tif", "tiff"))`` routing
    (google_vision_api_formatting.py:415-418)."""
    return payload is not None and bytes(payload[:4]) == TIFF_MAGIC


def build_tiff_payload(frame_texts: List[List[str]]) -> bytes:
    """Assemble a multi-frame payload from per-frame line lists (datagen /
    test helper; the inverse of split+extract). The line-oriented container
    cannot carry content lines that collide with its own markers — such
    lines are rejected here rather than silently corrupting the round trip."""
    lines = [FAKE_HEADER]
    for ordinal, frame_lines in enumerate(frame_texts, start=1):
        lines.append(f"FRAME {ordinal}")
        for line in frame_lines:
            if line in ("ENDFRAME", EOF_MARKER, FAKE_HEADER) or _FRAME_RE.match(line):
                raise ValueError(f"frame line collides with a container marker: {line!r}")
            if LINE_SEPARATOR in line:
                raise ValueError("frame lines must not contain newlines")
            lines.append(line)
        lines.append("ENDFRAME")
    lines.append(EOF_MARKER)
    return (LINE_SEPARATOR.join(lines) + LINE_SEPARATOR).encode("utf-8")


def split_tiff_frames(payload: bytes) -> List[bytes]:
    """Split a multi-frame payload into standalone single-frame payloads
    (the reference's ``_split_tiff``, document_utils.py:98-129). Raises
    ``DocumentSplitError`` when the payload carries the TIFF magic but no
    parseable frame structure."""
    text = decode_payload(payload)
    lines = text.split(LINE_SEPARATOR)
    if not lines or not lines[0].startswith("II*\x00"):
        raise DocumentSplitError("not a TIFF payload")
    frames: List[List[str]] = []
    current: List[str] = None
    for line in lines[1:]:
        if _FRAME_RE.match(line):
            if current is not None:
                raise DocumentSplitError("FRAME while previous frame unterminated")
            current = [line]
            frames.append(current)
        elif line == "ENDFRAME":
            if current is None:
                raise DocumentSplitError("ENDFRAME without FRAME")
            current.append(line)
            current = None
        elif line == EOF_MARKER:
            break
        elif current is not None:
            current.append(line)
    if len(frames) == 0 or current is not None:
        raise DocumentSplitError("document could not be split")
    return [
        (LINE_SEPARATOR.join([FAKE_HEADER] + frame_lines + [EOF_MARKER]) + LINE_SEPARATOR).encode(
            "utf-8"
        )
        for frame_lines in frames
    ]


def merge_tiff_frames(frame_payloads: List[bytes]) -> bytes:
    """Reassemble single-frame payloads into one document (the reference's
    ``_merge_tiff``, document_utils.py:244-276 — first frame re-saved with
    the rest appended)."""
    if not frame_payloads:
        raise ValueError("No files to merge")
    merged_lines = [FAKE_HEADER]
    for payload in frame_payloads:
        lines = decode_payload(payload).split(LINE_SEPARATOR)
        body = [ln for ln in lines if ln not in ("", FAKE_HEADER, EOF_MARKER)]
        merged_lines.extend(body)
    merged_lines.append(EOF_MARKER)
    return (LINE_SEPARATOR.join(merged_lines) + LINE_SEPARATOR).encode("utf-8")


class TiffFrameExtraction(NamedTuple):
    frame_number: int
    text: str
    spans: List[Span]
    language_code: str
    language_confidence: float


def extract_tiff_frame(frame_payload: bytes) -> TiffFrameExtraction:
    """Parse one single-frame payload into text + per-line spans.

    Lines are already in reading order (a scanned frame's OCR output);
    text = lines joined by newlines, one ``line`` span per line with char
    offsets into the frame text and the line ordinal as block id.
    """
    text = decode_payload(frame_payload)
    lines = text.split(LINE_SEPARATOR)
    frame_number = None
    content: List[str] = []
    for line in lines:
        match = _FRAME_RE.match(line)
        if match:
            frame_number = int(match.group(1))
        elif line in ("", FAKE_HEADER, EOF_MARKER, "ENDFRAME"):
            continue
        else:
            content.append(line)
    if frame_number is None:
        raise DocumentSplitError("frame payload missing FRAME marker")
    frame_text = LINE_SEPARATOR.join(content)
    spans: List[Span] = []
    offset = 0
    for ordinal, line in enumerate(content):
        spans.append(("line", offset, offset + len(line), ordinal))
        offset += len(line) + 1  # newline separator
    code, confidence = guess_language(frame_text)
    return TiffFrameExtraction(frame_number, frame_text, spans, code, confidence)
