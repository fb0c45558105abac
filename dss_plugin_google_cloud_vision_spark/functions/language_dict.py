# -*- coding: utf-8 -*-
"""Supported-language resource: the code → display-name map backing the
``language`` job parameter (the hint the extraction stage forwards to the
kernels, and the value the recipe UI validates against).

Parity surface: reference python-lib/language_dict.py:1-64 (regenerated
there by resource/get_language_list.py from the Vision API docs). The
engine reproduces the same ISO-639-1-style code set so a reference user's
saved ``language`` settings keep validating; ``iw`` (the API's legacy
Hebrew code) is kept verbatim for that reason.

Distinct from ``config.SUPPORTED_LANGUAGES`` (the subset the local
detector can actually *identify* — stopword profiles + script ranges in
functions/langid.py): a hint may name any supported language; detection
coverage is narrower and documented separately.
"""

from __future__ import annotations

from typing import Dict

SUPPORTED_LANGUAGES: Dict[str, str] = {
    "af": "Afrikaans",
    "sq": "Albanian",
    "ar": "Arabic",
    "hy": "Armenian",
    "be": "Belarusian",
    "bn": "Bengali",
    "bg": "Bulgarian",
    "ca": "Catalan",
    "zh": "Chinese",
    "hr": "Croatian",
    "cs": "Czech",
    "da": "Danish",
    "nl": "Dutch",
    "en": "English",
    "et": "Estonian",
    "tl": "Filipino",
    "fi": "Finnish",
    "fr": "French",
    "de": "German",
    "el": "Greek",
    "gu": "Gujarati",
    "iw": "Hebrew",
    "hi": "Hindi",
    "hu": "Hungarian",
    "is": "Icelandic",
    "id": "Indonesian",
    "it": "Italian",
    "ja": "Japanese",
    "kn": "Kannada",
    "km": "Khmer",
    "ko": "Korean",
    "lo": "Lao",
    "lv": "Latvian",
    "lt": "Lithuanian",
    "mk": "Macedonian",
    "ms": "Malay",
    "ml": "Malayalam",
    "mr": "Marathi",
    "ne": "Nepali",
    "no": "Norwegian",
    "pa": "Panjabi",
    "fa": "Persian",
    "pl": "Polish",
    "pt": "Portuguese",
    "ro": "Romanian",
    "ru": "Russian",
    "sr": "Serbian",
    "sk": "Slovak",
    "sl": "Slovenian",
    "es": "Spanish",
    "sv": "Swedish",
    "ta": "Tamil",
    "te": "Telugu",
    "th": "Thai",
    "tr": "Turkish",
    "uk": "Ukrainian",
    "vi": "Vietnamese",
    "yi": "Yiddish",
}
