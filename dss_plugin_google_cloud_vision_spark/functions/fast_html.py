# -*- coding: utf-8 -*-
"""Fast HTML tokenizer — a single-feed transcription of the stdlib
``html.parser`` tokenization (CPython 3.11) driving the same handlers,
without incremental-feed buffering or line/column tracking (``updatepos``
and the re-entrant ``goahead`` machinery are the stdlib's dominant cost).

Fidelity strategy: every tag-shaped decision reuses the stdlib's OWN
compiled regexes (``locatestarttagend_tolerant``, ``tagfind_tolerant``,
``attrfind_tolerant``, ``endtagfind``, ``commentclose``) and transcribes
the corresponding branch of ``HTMLParser.goahead`` / ``parse_starttag`` /
``parse_endtag`` / ``parse_html_declaration`` for the single-feed,
``convert_charrefs=True`` case the extractor uses. CDATA (script/style)
content is raw and ends only at a well-formed ``</elem␣*>`` exactly like
3.11's ``set_cdata_mode`` pattern; unterminated CDATA swallows the rest.

One deliberate deviation: the stdlib RAISES (``NotImplementedError`` from
``_markupbase``) on unknown marked sections like ``<![foo]>``; this
tokenizer is total and consumes them as bogus comments. The equivalence
suite (tests/test_fast_html_equivalence.py) fuzzes both engines and skips
only inputs where the stdlib itself errors.

Data-chunk boundaries may differ from the stdlib; the block collector
concatenates segments before whitespace normalization, so extraction
output is identical (asserted, not assumed).
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import (
    attrfind_tolerant,
    commentclose,
    endtagfind,
    locatestarttagend_tolerant,
    tagfind_tolerant,
)

# attribute-free tags (~80% of web-page tags) skip the full start-tag
# machinery; the name charset is a strict subset of the tolerant one and
# the immediate '>' means the full path would make the same decision
_SIMPLE_TAG = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)>")
# the single-alternation scanner for the non-CDATA hot loop: one match
# consumes a data run AND the following attribute-free tag (the dominant
# token pair in web text), halving regex calls vs find('<') + tag match;
# when the next construct is complex the match fails and the loop falls
# back to a C-level find for the data run
_DATA_SIMPLE = re.compile(r"([^<]*)<(/?)([a-zA-Z][a-zA-Z0-9]*)>")
# second fast path: start tags whose attributes are all well-formed
# name="quoted" pairs with no <, > or quote confusion in the value — a
# strict SUBSET of what locatestarttagend_tolerant + attrfind_tolerant
# accept, so the full machinery would reach the same handle_starttag with
# the same name (attributes are discarded by this tokenizer's contract)
_DATA_ATTR_TAG = re.compile(
    r"([^<]*)<([a-zA-Z][a-zA-Z0-9]*)"
    r"(?:\s+[a-zA-Z_:][a-zA-Z0-9_:.-]*\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'))+\s*>"
)

_MARKED_CLOSE = re.compile(r"]\s*]\s*>")
_MS_MARKED_CLOSE = re.compile(r"]\s*>")
_DECLNAME = re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_CDATA_ELEMENTS = ("script", "style")
_CDATA_CLOSE = {
    elem: re.compile(r"</\s*%s\s*>" % elem, re.IGNORECASE) for elem in _CDATA_ELEMENTS
}
_ALNUM_EQ_SLASH = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")


def tokenize(markup: str, handler) -> None:
    """Emit starttag/endtag/startendtag/data events into ``handler``."""
    n = len(markup)
    i = 0
    find = markup.find
    startswith = markup.startswith
    handle_data = handler.handle_data

    def emit(chunk: str) -> None:
        if chunk:
            handle_data(unescape(chunk) if "&" in chunk else chunk)

    def recover(pos: int) -> int:
        """stdlib goahead end-of-feed recovery for an incomplete construct
        at ``pos``: emit up to the next '>' (inclusive) or next '<'
        (exclusive) or one char, as data."""
        k = find(">", pos + 1)
        if k < 0:
            k = find("<", pos + 1)
            if k < 0:
                k = pos + 1
        else:
            k += 1
        emit(markup[pos:k])
        return k

    handle_starttag = handler.handle_starttag
    handle_endtag = handler.handle_endtag
    data_simple_match = _DATA_SIMPLE.match
    data_attr_match = _DATA_ATTR_TAG.match
    cdata_elem = None  # inside <script>/<style>

    while i < n:
        if cdata_elem is None:
            # hot loop: data run + attribute-free tag in ONE regex call
            m = data_simple_match(markup, i)
            if m:
                data, slash, name = m.group(1, 2, 3)
                if data:
                    handle_data(unescape(data) if "&" in data else data)
                name = name.lower()
                if slash:
                    handle_endtag(name)
                else:
                    handle_starttag(name, [])
                    if name in _CDATA_ELEMENTS:
                        cdata_elem = name
                i = m.end()
                continue
            # second fast path: data run + quoted-attribute start tag (a
            # strict subset of the tolerant machinery's accept set, so the
            # full path below would make the identical decision; attrs are
            # discarded either way)
            m = data_attr_match(markup, i)
            if m:
                data, name = m.group(1, 2)
                if data:
                    handle_data(unescape(data) if "&" in data else data)
                name = name.lower()
                handle_starttag(name, [])
                if name in _CDATA_ELEMENTS:
                    cdata_elem = name
                i = m.end()
                continue
            lt = find("<", i)
            if lt < 0:
                emit(markup[i:])
                break
            emit(markup[i:lt])
            i = lt
            # no fast-path match at ``lt`` (the combined regexes cover any
            # simple/quoted-attr tag there) -> straight to complex dispatch
        else:
            close = _CDATA_CLOSE[cdata_elem].search(markup, i)
            if close is None:
                break  # stdlib swallows unterminated CDATA content
            if close.start() > i:
                handle_data(markup[i : close.start()])  # raw
            i = close.start()
            # the match is a well-formed end tag at i
            simple = _SIMPLE_TAG.match(markup, i)
            if simple:
                name = simple.group(2).lower()
                if simple.group(1):
                    if name == cdata_elem:
                        handle_endtag(name)
                        cdata_elem = None
                    else:  # non-matching close inside CDATA: raw data
                        handle_data(markup[i : simple.end()])
                else:
                    handle_starttag(name, [])
                    if name in _CDATA_ELEMENTS:
                        cdata_elem = name
                i = simple.end()
                continue
            # spaced close (</script >): complex dispatch handles it below

        nxt = markup[i + 1 : i + 2]
        if nxt and (("a" <= nxt <= "z") or ("A" <= nxt <= "Z")):
            # --- parse_starttag / check_for_whole_start_tag ---
            m = locatestarttagend_tolerant.match(markup, i)
            j = m.end()
            after = markup[j : j + 1]
            if after == ">":
                endpos = j + 1
            elif after == "/":
                endpos = j + 2 if startswith("/>", j) else -1
            elif after == "":
                endpos = -1
            elif after in _ALNUM_EQ_SLASH:
                endpos = -1
            else:
                endpos = j if j > i else i + 1
            if endpos < 0:
                i = recover(i)
                continue
            name_match = tagfind_tolerant.match(markup, i + 1)
            tag = name_match.group(1).lower()
            k = name_match.end()
            while k < endpos:
                attr = attrfind_tolerant.match(markup, k)
                if not attr:
                    break
                k = attr.end()
            end = markup[k:endpos].strip()
            if end not in (">", "/>"):
                handle_data(markup[i:endpos])  # bogus start tag: raw data
                i = endpos
                continue
            if end.endswith("/>"):
                handler.handle_startendtag(tag, [])
            else:
                handler.handle_starttag(tag, [])
                if tag in _CDATA_ELEMENTS:
                    cdata_elem = tag
            i = endpos
        elif nxt == "/":
            # --- parse_endtag ---
            gt = find(">", i + 1)
            if gt < 0:
                i = recover(i)
                continue
            gtpos = gt + 1
            m = endtagfind.match(markup, i)
            if m:
                elem = m.group(1).lower()
                if cdata_elem is not None and elem != cdata_elem:
                    handle_data(markup[i:gtpos])  # raw
                    i = gtpos
                    continue
                handler.handle_endtag(elem)
                cdata_elem = None
                i = gtpos
                continue
            if cdata_elem is not None:
                handle_data(markup[i:gtpos])  # raw
                i = gtpos
                continue
            name_match = tagfind_tolerant.match(markup, i + 2)
            if not name_match:
                if markup[i : i + 3] == "</>":
                    i = i + 3
                    continue
                # bogus comment: consume to '>'
                pos = find(">", i + 2)
                if pos == -1:
                    i = recover(i)
                else:
                    i = pos + 1
                continue
            handler.handle_endtag(name_match.group(1).lower())
            i = find(">", name_match.end()) + 1
        elif nxt == "!":
            # --- parse_html_declaration ---
            if startswith("<!--", i):
                close = commentclose.search(markup, i + 4)
                i = recover(i) if close is None else close.end()
            elif startswith("<![", i):
                name_match = _DECLNAME.match(markup, i + 3)
                sect = name_match.group().lower().strip() if name_match else None
                if sect in ("temp", "cdata", "ignore", "include", "rcdata"):
                    close = _MARKED_CLOSE.search(markup, i + 3)
                elif sect in ("if", "else", "endif"):
                    close = _MS_MARKED_CLOSE.search(markup, i + 3)
                else:
                    # stdlib raises here; stay total: bogus-comment consume
                    pos = find(">", i + 2)
                    i = recover(i) if pos == -1 else pos + 1
                    continue
                i = recover(i) if close is None else close.end()
            elif markup[i : i + 9].lower() == "<!doctype":
                gt = find(">", i + 9)
                i = recover(i) if gt < 0 else gt + 1
            else:
                pos = find(">", i + 2)
                i = recover(i) if pos == -1 else pos + 1
        elif nxt == "?":
            gt = find(">", i + 2)
            i = recover(i) if gt < 0 else gt + 1
        else:
            if i + 1 < n:
                handle_data("<")
                i += 1
            else:
                emit(markup[i:])  # trailing lone '<'
                break
