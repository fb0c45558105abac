# -*- coding: utf-8 -*-
"""Deterministic heuristic language identification.

Plays the role of the reference's Vision-detected ``languageCode`` /
``confidence`` pair (reference: python-lib/google_vision_api_formatting.py:
270-281 reads ``detectedLanguages`` sorted by confidence). Ours is a local
heuristic: stopword-profile matching for Latin-script languages plus
Unicode-script detection for non-Latin scripts. Pure function of the text;
confidence is a deterministic ratio rounded to 4 decimals.

Language codes come from the reference's supported-language set
(reference: python-lib/language_dict.py:4-64).
"""

from __future__ import annotations

import re
from collections import Counter
from typing import Dict, Tuple

# Small, fixed stopword profiles. Order of dict literals is insertion order
# (stable in Python 3.7+); ties are broken by profile order for determinism.
LANG_STOPWORDS: Dict[str, Tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with", "for", "was"),
    "fr": ("le", "la", "et", "les", "des", "est", "dans", "pour", "que", "une"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "auf"),
    "es": ("el", "la", "de", "que", "y", "los", "en", "un", "por", "con"),
    "it": ("il", "di", "che", "e", "la", "per", "un", "sono", "con", "non"),
    "pt": ("o", "de", "a", "que", "e", "do", "da", "em", "um", "para"),
    "nl": ("de", "het", "een", "van", "en", "dat", "is", "op", "te", "met"),
    "sv": ("och", "att", "det", "som", "en", "av", "den", "till", "är", "med"),
    "tr": ("bir", "ve", "bu", "da", "için", "ile", "olarak", "çok", "daha", "gibi"),
    "id": ("yang", "dan", "di", "itu", "dengan", "untuk", "tidak", "ini", "dari", "dalam"),
}

# Unicode-script ranges for non-Latin-script languages.
SCRIPT_RANGES: Tuple[Tuple[str, int, int], ...] = (
    ("zh", 0x4E00, 0x9FFF),
    ("ja", 0x3040, 0x30FF),
    ("ko", 0xAC00, 0xD7AF),
    ("ar", 0x0600, 0x06FF),
    ("ru", 0x0400, 0x04FF),
    ("el", 0x0370, 0x03FF),
    ("iw", 0x0590, 0x05FF),
    ("hi", 0x0900, 0x097F),
    ("th", 0x0E00, 0x0E7F),
)

_TOKEN_RE = re.compile(r"[^\W\d_]+", re.UNICODE)

# one compiled character class per script range (C-level counting on the
# non-ASCII path; ranges are disjoint so per-range counts equal the
# first-match-wins per-char scan)
_SCRIPT_RES: Tuple[re.Pattern, ...] = tuple(
    re.compile(f"[{chr(lo)}-{chr(hi)}]") for _code, lo, hi in SCRIPT_RANGES
)

# inverted index token → language codes claiming it: one dict probe per
# distinct token instead of one set-membership test per language
_STOPWORD_CODES: dict = {}
for _code, _words in LANG_STOPWORDS.items():
    for _w in _words:
        _STOPWORD_CODES.setdefault(_w, []).append(_code)
_LANG_ORDER: Tuple[str, ...] = tuple(LANG_STOPWORDS.keys())


def guess_language(text: str) -> Tuple[str, float]:
    """Return (language_code, confidence in [0,1]) for ``text``.

    Rules, in order:
    1. If >=30% of non-space characters fall in one non-Latin script range,
       that script's language wins; confidence = that fraction.
    2. Otherwise the stopword profile with the highest hit ratio wins;
       confidence = matched_tokens / total_tokens.
    3. Empty / no signal → ("", None-like 0.0) — the caller maps a zero
       confidence to the reference's empty ``language_code`` sentinel.
    All arithmetic is deterministic; confidence rounded to 4 decimals.
    """
    if not text:
        return "", 0.0
    # ASCII text cannot fall in any non-Latin script range — skip the scan
    # (identical result, this is the dominant case for web text)
    is_ascii = text.isascii()
    if not is_ascii:
        # C-level passes replacing the per-char Python loop (which was
        # ~the whole langid cost on non-Latin pages):
        # - non-space char count via str.split() — argless split strips
        #   exactly the str.isspace() whitespace set, so the count is
        #   identical to the `if c.isspace(): continue` loop;
        # - per-script counts via one compiled character-class findall
        #   each — the ranges are DISJOINT, so first-match-wins equals
        #   count-per-range. Script chars are never whitespace.
        n_chars = sum(len(part) for part in text.split())
        if n_chars == 0:
            return "", 0.0
        for idx, (code, _lo, _hi) in enumerate(SCRIPT_RANGES):
            hits = len(_SCRIPT_RES[idx].findall(text))
            if hits and hits / n_chars >= 0.30:
                return code, round(hits / n_chars, 4)
    elif not text.strip():
        return "", 0.0
    if is_ascii:
        # ASCII lowercasing never changes token boundaries: one C-level
        # pass over the string replaces a per-token lower() loop
        tokens = _TOKEN_RE.findall(text.lower())
    else:
        tokens = [t.lower() for t in _TOKEN_RE.findall(text)]
    if not tokens:
        return "", 0.0
    counts = Counter(tokens)
    # inverted index: one probe per distinct token; tie-break identical to
    # the per-language loop (earlier language wins on equal hits)
    per_code: dict = {}
    lookup = _STOPWORD_CODES
    for token, n in counts.items():
        codes = lookup.get(token)
        if codes:
            for code in codes:
                per_code[code] = per_code.get(code, 0) + n
    best_code, best_hits = "", 0
    for code in _LANG_ORDER:
        hits = per_code.get(code, 0)
        if hits > best_hits:
            best_code, best_hits = code, hits
    if best_hits == 0:
        return "", 0.0
    return best_code, round(best_hits / len(tokens), 4)
