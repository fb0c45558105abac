# -*- coding: utf-8 -*-
"""Deterministic, SQL-expressible enrichment functions for the pluggable
``extract()`` surface (X1/X2).

The reference's ``parallelizer`` takes any user row/batch callable
(reference: python-lib/parallelizer.py:160-204); these are engine-shipped
examples whose outputs a SQL oracle can reproduce exactly, so the driver's
correctness gate exercises the guarded row map (M1), the guarded batch map
(M2) and the positional batch-response parser incl. its error-dict routing
(M3, reference: python-lib/google_vision_api_client.py:59-78) end-to-end.

They live in the package (not the entry script) so Spark workers can
unpickle them from the shipped package zip.
"""

from __future__ import annotations

import json
from typing import Dict, List

from ..errors import ExtractionError


def token_stats_row(row: Dict, text_column: str = "text") -> str:
    """Row-mode enricher: token/char counts as a JSON response string.
    Empty text raises ``ExtractionError`` — captured into the error
    columns by ``guarded_row_map`` (M1)."""
    text = row.get(text_column)
    if not text:
        raise ExtractionError("empty text")
    return json.dumps(
        {"n_tokens": len(text.split(" ")), "n_chars": len(text)}, separators=(",", ":")
    )


def token_stats_batch(batch: List[Dict], text_column: str = "text") -> List[Dict]:
    """Batch-mode enricher: positionally-aligned results; empty-text rows
    yield an error dict that the default batch parser routes into the
    error columns (M3 error-dict semantics)."""
    responses = []
    for row in batch:
        text = row.get(text_column)
        if not text:
            responses.append({"error": {"message": "empty text", "code": 400}})
        else:
            responses.append({"n_tokens": len(text.split(" ")), "n_chars": len(text)})
    return responses
