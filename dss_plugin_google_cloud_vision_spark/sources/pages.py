# -*- coding: utf-8 -*-
"""Deterministic synthetic ``pages`` table — the engine's primary input
shape per BASELINE.json input_hint:

    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Every row is a pure function of ``(seed, row_id)``: generation is identical
regardless of partitioning, cluster size or run count (needed both for
byte-identity goldens and for generating the same bench input at different
parallelism levels). Hosts follow a Zipf-like skew — two hot hosts hold
about half the rows — to exercise the skew-salting path.

Row kinds (mirroring FIXTURES.md §1):
- ``article``   — templated HTML: header/nav/aside/footer boilerplate + one
                  ``<article>`` main block (heading + paragraphs)
- ``divsoup``   — main content in plain ``<div><p>`` markup (no article
                  tag): exercises the density heuristic, not tag routing
- ``linkfarm``  — boilerplate/link-only page: extracts to empty text
- ``pdf``       — multi-page ``%PDF-`` payload with shuffled layout blocks
- ``badpdf``    — ``%PDF-`` magic but unsplittable (DocumentSplitError path)
- ``empty`` / ``binary_junk`` — error-path payloads (ExtractionError)

``expected_page(i, seed)`` computes the ground-truth extraction for row
``i`` analytically (same block-keeping rules as the extractor, applied to
the known generated content) — it does NOT call the extractor, so golden
tests are a real cross-check, not a tautology.
"""

from __future__ import annotations

import datetime
from random import Random
from typing import Dict, Iterator, List, Optional

from ..functions.html_extract import BLOCK_SEPARATOR, MIN_ARTICLE_CHARS, MIN_CONTENT_CHARS
from ..functions.langid import LANG_STOPWORDS
from ..functions.pdf_extract import EOF_MARKER, FAKE_HEADER

PAGE_SEPARATOR = "\f"  # between page texts when reassembling a document

N_HOSTS = 20
# two hot hosts with ~50% of traffic, the rest roughly uniform
_HOST_WEIGHTS = [0.30, 0.20] + [0.50 / (N_HOSTS - 2)] * (N_HOSTS - 2)
_HOST_CUMULATIVE = []
_acc = 0.0
for _w in _HOST_WEIGHTS:
    _acc += _w
    _HOST_CUMULATIVE.append(_acc)

_LANGS = list(LANG_STOPWORDS.keys())
# per-language filler words (disjoint from every stopword list, so language
# identification stays unambiguous on generated text)
_FILLERS = {
    "en": ("market", "garden", "river", "window", "stone", "music", "paper", "animal"),
    "fr": ("marché", "jardin", "rivière", "fenêtre", "pierre", "musique", "papier", "animal"),
    "de": ("markt", "garten", "fluss", "fenster", "stein", "musik", "papier", "tier"),
    "es": ("mercado", "jardín", "río", "ventana", "piedra", "música", "papel", "animal"),
    "it": ("mercato", "giardino", "fiume", "finestra", "pietra", "musica", "carta", "animale"),
    "pt": ("mercado", "jardim", "rio", "janela", "pedra", "música", "papel", "bicho"),
    "nl": ("markt", "tuin", "rivier", "raam", "steen", "muziek", "papier", "dier"),
    "sv": ("marknad", "trädgård", "flod", "fönster", "sten", "musik", "papper", "djur"),
    "tr": ("pazar", "bahçe", "nehir", "pencere", "taş", "müzik", "kağıt", "hayvan"),
    "id": ("pasar", "kebun", "sungai", "jendela", "batu", "musik", "kertas", "hewan"),
}

_EPOCH = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)

KIND_ARTICLE = "article"
KIND_DIVSOUP = "divsoup"
KIND_LINKFARM = "linkfarm"
KIND_PDF = "pdf"
KIND_BADPDF = "badpdf"
KIND_EMPTY = "empty"
KIND_JUNK = "binary_junk"


def _rng(i: int, seed: int) -> Random:
    return Random(seed * 1_000_003 + i)


def _host(rng: Random) -> str:
    r = rng.random()
    for idx, cumulative in enumerate(_HOST_CUMULATIVE):
        if r <= cumulative:
            return f"host{idx:02d}.example.org"
    return f"host{N_HOSTS - 1:02d}.example.org"


def _kind(rng: Random) -> str:
    r = rng.random()
    if r < 0.60:
        return KIND_ARTICLE
    if r < 0.72:
        return KIND_DIVSOUP
    if r < 0.78:
        return KIND_LINKFARM
    if r < 0.92:
        return KIND_PDF
    if r < 0.94:
        return KIND_BADPDF
    if r < 0.97:
        return KIND_EMPTY
    return KIND_JUNK


def _words(rng: Random, lang: str, n: int) -> str:
    vocab = list(LANG_STOPWORDS[lang]) * 2 + list(_FILLERS[lang])
    return " ".join(rng.choice(vocab) for _ in range(n))


def _heading(rng: Random, lang: str) -> str:
    return _words(rng, lang, rng.randint(3, 6)).capitalize()


def _paragraphs(rng: Random, lang: str) -> List[str]:
    return [_words(rng, lang, rng.randint(15, 40)) for _ in range(rng.randint(2, 5))]


def _nav_links(rng: Random) -> str:
    items = "".join(
        f'<li><a href="/section-{j}">Sec {j}</a></li>' for j in range(rng.randint(4, 9))
    )
    return f"<nav><ul>{items}</ul></nav>"


def _link_farm(rng: Random, n: int) -> str:
    items = "".join(
        f'<li><a href="/related-{j}">related article number {j} with a long anchor</a></li>'
        for j in range(n)
    )
    return f"<ul>{items}</ul>"


def _html_payload(rng: Random, lang: str, host: str, kind: str) -> (bytes, List[str]):
    """Render the HTML and return (payload, expected kept-block texts)."""
    heading = _heading(rng, lang)
    paragraphs = _paragraphs(rng, lang)
    nav = _nav_links(rng)
    farm = _link_farm(rng, rng.randint(5, 12))
    head = f"<head><title>Site {host}</title><style>body {{margin: 0}}</style></head>"
    header = f"<header><h1>Site {host}</h1>{nav}</header>"
    footer = f"<footer><p>copyright {host} all rights reserved</p></footer>"
    aside = f"<aside>{farm}</aside>"
    if kind == KIND_ARTICLE:
        body_main = (
            "<article>"
            + f"<h2>{heading}</h2>"
            + "".join(f"<p>{p}</p>" for p in paragraphs)
            + "</article>"
        )
        # inside <article> the extractor keeps blocks >= MIN_ARTICLE_CHARS;
        # a 3-short-word heading can fall below that
        expected = ([heading] if len(heading) >= MIN_ARTICLE_CHARS else []) + paragraphs
    elif kind == KIND_DIVSOUP:
        body_main = (
            '<div class="post">'
            + f"<h2>{heading}</h2>"
            + "".join(f"<div><p>{p}</p></div>" for p in paragraphs)
            + "</div>"
        )
        # outside <article>, the density rule applies: blocks below
        # MIN_CONTENT_CHARS are dropped (paragraphs are always long enough)
        expected = ([heading] if len(heading) >= MIN_CONTENT_CHARS else []) + paragraphs
    else:  # linkfarm
        body_main = f'<div class="links">{_link_farm(rng, rng.randint(8, 15))}</div>'
        expected = []
    html = (
        "<!DOCTYPE html><html>"
        + head
        + "<body>"
        + header
        + f'<div class="content">{body_main}</div>'
        + aside
        + footer
        + "</body></html>"
    )
    return html.encode("utf-8"), expected


def _pdf_payload(rng: Random, lang: str) -> (bytes, List[str]):
    """Render a multi-page layout payload and return (payload, expected
    per-page reading-order texts)."""
    n_pages = rng.randint(1, 4)
    lines = [FAKE_HEADER]
    page_texts: List[str] = []
    block_id_counter = 0
    for page_no in range(1, n_pages + 1):
        lines.append(f"PAGE {page_no}")
        n_blocks = rng.randint(2, 5)
        blocks = []
        for _ in range(n_blocks):
            y = rng.randint(0, 9) * 100
            x = rng.randint(0, 5) * 80
            text = _words(rng, lang, rng.randint(4, 12))
            blocks.append((y, x, block_id_counter, text))
            block_id_counter += 1
        emit_order = list(blocks)
        rng.shuffle(emit_order)
        for (y, x, block_id, text) in emit_order:
            lines.append(f"BLOCK id={block_id} y={y} x={x}")
            lines.append(text)
            lines.append("ENDBLOCK")
        lines.append("ENDPAGE")
        page_texts.append("\n".join(b[3] for b in sorted(blocks)))
    lines.append(EOF_MARKER)
    return ("\n".join(lines) + "\n").encode("utf-8"), page_texts


def make_page(i: int, seed: int = 42) -> Dict:
    """Row ``i`` of the pages table (pure function of (i, seed))."""
    expected = expected_page(i, seed)
    return {
        "url": expected["url"],
        "warc_ts": _EPOCH + datetime.timedelta(seconds=i * 137),
        "html": expected["_payload"],
        "text": expected["doc_text"] if not expected["is_error"] else "",
        "lang": expected["lang"],
    }


def expected_page(i: int, seed: int = 42) -> Dict:
    """Ground truth for row ``i``: url, kind, per-page texts, document text,
    error flag. Computed analytically from the generated content."""
    rng = _rng(i, seed)
    host = _host(rng)
    kind = _kind(rng)
    lang = _LANGS[i % len(_LANGS)]
    suffix = "pdf" if kind in (KIND_PDF, KIND_BADPDF) else "html"
    url = f"https://{host}/{lang}/doc-{i}.{suffix}"
    if kind in (KIND_ARTICLE, KIND_DIVSOUP, KIND_LINKFARM):
        payload, kept_blocks = _html_payload(rng, lang, host, kind)
        page_texts = [BLOCK_SEPARATOR.join(kept_blocks)]
        doc_text = page_texts[0]
        is_error, page_count = False, 1
    elif kind == KIND_PDF:
        payload, page_texts = _pdf_payload(rng, lang)
        doc_text = PAGE_SEPARATOR.join(page_texts)
        is_error, page_count = False, len(page_texts)
    elif kind == KIND_BADPDF:
        payload = b"%PDF-FAKE 1.0\nnot a parseable document body\n"
        page_texts, doc_text, is_error, page_count = [], "", True, 0
    elif kind == KIND_EMPTY:
        payload = b""
        page_texts, doc_text, is_error, page_count = [], "", True, 0
    else:  # binary junk: not valid UTF-8
        payload = b"\xff\xfe\x00junk" + bytes([i % 251]) * 16
        page_texts, doc_text, is_error, page_count = [], "", True, 0
    return {
        "url": url,
        "host": host,
        "kind": kind,
        "lang": lang,
        "page_texts": page_texts,
        "doc_text": doc_text,
        "page_count": page_count,
        "is_error": is_error,
        "_payload": payload,
    }


PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def iter_pages(start: int, end: int, seed: int = 42) -> Iterator[Dict]:
    for i in range(start, end):
        yield make_page(i, seed)


def tiny_pages_df(spark, n_rows: int = 64, seed: int = 42):
    """Driver-side generation for unit/golden tests."""
    rows = [
        (p["url"], p["warc_ts"], p["html"], p["text"], p["lang"])
        for p in iter_pages(0, n_rows, seed)
    ]
    return spark.createDataFrame(rows, schema=PAGES_DDL)


def pages_df(spark, n_rows: int, seed: int = 42, partitions: Optional[int] = None):
    """Distributed generation via mapInArrow over ``spark.range`` — scales
    to bench sizes without driver materialization; deterministic because
    each row is keyed on its global id, not its partition."""
    import pyarrow as pa

    num_parts = partitions or spark.sparkContext.defaultParallelism

    def generate(record_batches):
        for rb in record_batches:
            ids = rb.column(0).to_pylist()
            rows = [make_page(i, seed) for i in ids]
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([r["url"] for r in rows], type=pa.string()),
                    pa.array([r["warc_ts"] for r in rows], type=pa.timestamp("us", tz="UTC")),
                    pa.array([r["html"] for r in rows], type=pa.binary()),
                    pa.array([r["text"] for r in rows], type=pa.string()),
                    pa.array([r["lang"] for r in rows], type=pa.string()),
                ],
                names=["url", "warc_ts", "html", "text", "lang"],
            )

    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    return spark.range(0, n_rows, numPartitions=num_parts).mapInArrow(generate, schema)


def write_pages(spark, path: str, n_rows: int, seed: int = 42, partitions: Optional[int] = None):
    """Materialize a pages table as parquet (Iceberg degrades to parquet in
    this sandbox — SURVEY.md §7 risk note)."""
    pages_df(spark, n_rows, seed, partitions).write.mode("overwrite").parquet(path)
