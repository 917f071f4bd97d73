"""Main-content (boilerplate) extraction — jusText/trafilatura-lite.

A small from-scratch block segmenter over ``html.parser`` plus the
classic density heuristic: a block element is CONTENT iff its
link-character density is <= MAX_LINK_DENSITY and it has at least
MIN_WORDS words. No template knowledge: navs and footers fall out
because they are link-dense or too short, not because of their class
names (tests plant decoys both ways).

Used by pipelines/webtext_ops.q_main_content_extract; the page renderer
is the deterministic derived-input twin the SQL oracle reconstructs
(the multimodal/make_fake_image pattern).

Reference parity: the reference extracts FULL text only
(europarl/rules/extraction.py get_text); main-content extraction is one
of the additional training-data operators the brief asks for.
"""

from __future__ import annotations

import html as _html
import re
from html.parser import HTMLParser

MAX_LINK_DENSITY = 0.25
MIN_WORDS = 3

# Elements that delimit text blocks. Inline elements (a, b, i, span, em,
# strong, code) do NOT flush — their text stays in the enclosing block.
_BLOCK_TAGS = frozenset(
    "html head body title div p li ul ol h1 h2 h3 h4 h5 h6 br table tr td "
    "th nav header footer section article aside blockquote pre".split()
)

_WS_RUN = re.compile(r"[ \t\n\r\f]+")


class _BlockSegmenter(HTMLParser):
    """Accumulates (normalized_text, link_chars, total_chars) per block.

    Any block-tag boundary (open or close) flushes the current block;
    text inside <a> counts toward link_chars. charrefs are converted by
    html.parser itself (convert_charrefs=True default)."""

    def __init__(self) -> None:
        super().__init__()
        self._parts: list[str] = []
        self._link_chars = 0
        self._a_depth = 0
        self.blocks: list[tuple[str, int, int]] = []

    def _flush(self) -> None:
        raw = "".join(self._parts)
        text = _WS_RUN.sub(" ", raw).strip()
        if text:
            # link density is measured over RAW content chars so
            # whitespace normalization can't flip the ratio
            total = sum(len(p) for p in self._parts if p.strip())
            self.blocks.append((text, self._link_chars, max(total, 1)))
        self._parts = []
        self._link_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._a_depth += 1

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a" and self._a_depth:
            self._a_depth -= 1

    def handle_data(self, data):
        self._parts.append(data)
        if self._a_depth and data.strip():
            self._link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def extract_main_blocks(page_html: str) -> tuple[list[str], int]:
    """(kept_block_texts_in_order, n_blocks_total). A block survives iff
    link_density <= MAX_LINK_DENSITY and word count >= MIN_WORDS."""
    p = _BlockSegmenter()
    p.feed(page_html)
    p.close()
    kept = [
        text
        for text, link_chars, total in p.blocks
        if link_chars / total <= MAX_LINK_DENSITY and len(text.split()) >= MIN_WORDS
    ]
    return kept, len(p.blocks)


def _chunks(words: list[str], w: int) -> list[list[str]]:
    """floor(n/w) chunks, last one absorbs the remainder (so every chunk
    has >= w words except the single-chunk case) — keeps every content
    block above the MIN_WORDS floor for any text with >= MIN_WORDS
    words."""
    n = max(1, len(words) // w)
    out = [words[i * w : (i + 1) * w] for i in range(n - 1)]
    out.append(words[(n - 1) * w :])
    return out


def render_boilerplate_page(
    doc_id: int, text: str, source: str, chunk_w: int = 20
) -> str:
    """Deterministic full-page render: short title, link-dense nav,
    the document text as <p> chunks (joined back with single spaces
    they reconstruct the text exactly), and a link-heavy footer. Block
    census: title + nav + floor-chunks + footer = n_chunks + 3."""
    esc = _html.escape
    paras = "".join(
        f"<p>{esc(' '.join(c))}</p>" for c in _chunks(text.split(" "), chunk_w)
    )
    return (
        f"<html><head><title>Doc {doc_id}</title></head><body>"
        f'<div class="nav"><a href="/">home</a> <a href="/all">all documents</a> '
        f'<a href="/s/{esc(source)}">{esc(source)}</a> <a href="/help">help</a></div>'
        f'<div class="main">{paras}</div>'
        f'<div class="footer"><p>copyright 2024 <a href="/tos">terms of service</a> '
        f'<a href="/privacy">privacy policy page</a> '
        f'<a href="/contact">contact the site team</a> all rights reserved</p></div>'
        f"</body></html>"
    )
