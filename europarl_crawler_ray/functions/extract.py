"""HTML → text extraction — the byte-identical contract.

The reference extracts text as ``BeautifulSoup(file.read(), "html.parser")
.get_text()`` with the file opened in TEXT mode
(``/root/reference/europarl/rules/extraction.py:40-43``) and pins
``beautifulsoup4==4.9.3`` (Pipfile.lock). bs4 is not available in this
environment, so this module is a from-scratch reimplementation of exactly
that call's observable semantics on top of stdlib ``html.parser`` (which is
also what bs4's "html.parser" tree builder wraps). Replicated behaviors, in
bs4 4.9.3 terms:

- character references are converted (``convert_charrefs=True``, the
  HTMLParserTreeBuilder default) — except inside script/style CDATA content,
  which is excluded anyway;
- ``get_text()`` yields strings whose concrete type is ``NavigableString``
  or ``CData`` (the 4.9.3 ``_all_strings`` default ``types=(NavigableString,
  CData)``): plain text and ``<![CDATA[...]]>`` contents are included;
  ``Comment``, ``Doctype``/``Declaration``, ``ProcessingInstruction`` are
  excluded; and — new in bs4 4.9 — the contents of ``<script>``, ``<style>``
  and ``<template>`` become ``Script``/``Stylesheet``/``TemplateString``
  nodes and are therefore excluded;
- consecutive data chunks between tree events merge into one string, and a
  merged string that is entirely ASCII whitespace (``" \\n\\t\\f\\r"``) is
  normalized to ``"\\n"`` if it contains a newline else ``" "`` — unless
  inside a ``<pre>``/``<textarea>`` (``preserve_whitespace_tags``);
- text-mode file read implies universal newlines: ``\\r\\n`` and ``\\r``
  become ``\\n`` before parsing (replicated in :func:`html_to_text`);
- any error (here: undecodable bytes) yields ``None``
  (``extraction.py:48-50``).

Golden fixtures in ``tests/test_extract.py`` pin this contract with
hand-written expected outputs.
"""

from __future__ import annotations

from html.parser import HTMLParser

ASCII_SPACES = " \n\t\x0c\r"  # bs4 4.9.3 BeautifulSoup.ASCII_SPACES
_PRESERVE_WS = ("pre", "textarea")  # HTMLTreeBuilder.preserve_whitespace_tags
_CDATA_ELEMS = ("script", "style")  # html.parser CDATA_CONTENT_ELEMENTS

# bs4 4.9.3 entity handling: the builder passes convert_charrefs=False and
# BeautifulSoupHTMLParser resolves entities ITSELF from the HTML4 table
# (html.entities.codepoint2name inverse) — HTML5-only names like &apos;
# stay literal, unlike stdlib convert_charrefs=True (HTML5 table).
from html.entities import codepoint2name as _cp2name

HTML4_ENTITY_TO_CHARACTER = {name: chr(cp) for cp, name in _cp2name.items()}

# bs4's empty-element (void) tags — never pushed on the open-tag stack
# (HTMLTreeBuilder.empty_element_tags)
_EMPTY_ELEMENT_TAGS = frozenset(
    "area base br col embed hr img input keygen link menuitem meta param source track wbr "
    "basefont bgsound command frame image isindex nextid spacer".split()
)


class _TextCollector(HTMLParser):
    """Collects exactly the strings bs4-4.9.3 ``get_text()`` would join."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=False)
        self.parts: list[str] = []
        self._run: list[str] = []          # consecutive data chunks buffer
        self._cdata_skip: str | None = None  # inside <script>/<style>
        # open-tag stack mirroring bs4's tagStack/_popToTag: an end tag
        # implicitly closes everything above its matching start tag, so an
        # unclosed <template>/<pre> ends when an ANCESTOR closes
        self._stack: list[str] = []
        self._template_depth = 0
        self._preserve_ws_depth = 0

    # -- run buffering (bs4 current_data + endData) --------------------
    def _flush(self) -> None:
        if not self._run:
            return
        data = "".join(self._run)
        self._run.clear()
        if not data:
            return
        if self._preserve_ws_depth == 0 and not data.strip(ASCII_SPACES):
            data = "\n" if "\n" in data else " "
        if self._cdata_skip is None and self._template_depth == 0:
            self.parts.append(data)

    # -- bs4-style tag stack -------------------------------------------
    def _push(self, tag: str) -> None:
        self._stack.append(tag)
        if tag == "template":
            self._template_depth += 1
        elif tag in _PRESERVE_WS:
            self._preserve_ws_depth += 1

    def _pop_one(self) -> None:
        tag = self._stack.pop()
        if tag == "template":
            self._template_depth -= 1
        elif tag in _PRESERVE_WS:
            self._preserve_ws_depth -= 1

    def _pop_to(self, tag: str) -> None:
        """bs4 _popToTag: pop up to and including the most recent open
        ``tag``; a stray end tag with no open match is ignored."""
        if tag not in self._stack:
            return
        while self._stack:
            top = self._stack[-1]
            self._pop_one()
            if top == tag:
                break

    # -- parser events --------------------------------------------------
    def handle_data(self, data: str) -> None:
        self._run.append(data)

    def handle_entityref(self, name: str) -> None:
        # bs4 BeautifulSoupHTMLParser.handle_entityref: HTML4 lookup, else
        # the reference kept verbatim
        char = HTML4_ENTITY_TO_CHARACTER.get(name)
        self._run.append(char if char is not None else f"&{name};")

    def handle_charref(self, name: str) -> None:
        # bs4 BeautifulSoupHTMLParser.handle_charref: numeric refs < 256
        # decode as windows-1252 first (original_encoding is None when a
        # str was parsed), then chr(), then U+FFFD
        if name.lower().startswith("x"):
            real = int(name[1:], 16)
        else:
            real = int(name)
        data = None
        if real < 256:
            try:
                data = bytearray([real]).decode("windows-1252")
            except UnicodeDecodeError:
                pass
        if not data:
            try:
                data = chr(real)
            except (ValueError, OverflowError):
                pass
        self._run.append(data or "\N{REPLACEMENT CHARACTER}")

    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag in _CDATA_ELEMS:
            self._cdata_skip = tag
            self._push(tag)
        elif tag not in _EMPTY_ELEMENT_TAGS:
            self._push(tag)

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if self._cdata_skip is not None:
            # inside script/style the parser only surfaces the MATCHING
            # end tag; anything else arrived as raw data
            if tag == self._cdata_skip:
                self._cdata_skip = None
                self._pop_to(tag)
        else:
            self._pop_to(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # bs4 handles <x/> as start+immediate end: no net stack change; a
        # tree event still flushes the pending run (and never enters CDATA
        # mode — html.parser calls this instead of set_cdata_mode)
        self._flush()

    def handle_comment(self, data: str) -> None:
        self._flush()  # Comment nodes are excluded from get_text

    def handle_decl(self, decl: str) -> None:
        self._flush()  # Doctype — excluded

    def handle_pi(self, data: str) -> None:
        self._flush()  # ProcessingInstruction — excluded

    def unknown_decl(self, data: str) -> None:
        # bs4 turns <![CDATA[x]]> into CData("x"), which IS included by the
        # 4.9.3 get_text default (types=(NavigableString, CData)) — but
        # string_container() overrides the class inside <template>
        # containers, turning it into an excluded TemplateString.
        self._flush()
        if data.startswith("CDATA[") and self._template_depth == 0:
            cdata = data[len("CDATA["):]
            if cdata:
                if self._preserve_ws_depth == 0 and not cdata.strip(ASCII_SPACES):
                    cdata = "\n" if "\n" in cdata else " "
                self.parts.append(cdata)

    def text(self) -> str:
        self._flush()
        return "".join(self.parts)


def get_text(html: str) -> str:
    """bs4-4.9.3-equivalent ``BeautifulSoup(html, "html.parser").get_text()``."""
    p = _TextCollector()
    p.feed(html)
    p.close()
    return p.text()


def html_to_text(html_bytes: bytes | None, encoding: str = "utf-8") -> str | None:
    """Full reference path: text-mode read → parse → get_text.

    Mirrors ``filecontent(filepath, ".html")`` (extraction.py:39-52):
    universal-newline decode, then get_text; any failure → None.
    """
    if html_bytes is None:
        return None
    try:
        s = html_bytes.decode(encoding)
        # text-mode read: universal newline translation
        if "\r" in s:
            s = s.replace("\r\n", "\n").replace("\r", "\n")
        return get_text(s)
    except Exception:
        return None


def filesize(html_bytes: bytes | None) -> int | None:
    """Byte length of the stored blob (reference extraction.py:9-24 uses
    os.path.getsize on the file the bytes were written to)."""
    if html_bytes is None:
        return None
    return len(html_bytes)


class LinkExtractor(HTMLParser):
    """Collect anchor hrefs the way a DOM walk would (crawl-frontier
    outlink discovery). Built on the same stdlib parser as the
    byte-identical text contract above, so script/style contents are
    CDATA (an ``<a href>`` string inside a script is NOT a link) and
    comments never surface — the failure modes a naive regex extractor
    has. Mirrors the reference's bs4 ``soup.find_all('a')`` usage
    (/root/reference/europarl/downloader.py:117-138) without bs4."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)
                    break

    handle_startendtag = handle_starttag


def extract_hrefs(html: str) -> list[str]:
    """All <a href> values in document order."""
    p = LinkExtractor()
    p.feed(html)
    p.close()
    return p.hrefs


class AnchorExtractor(HTMLParser):
    """Collect (href, anchor_text) pairs — the link-with-label walk an
    anchor-text index needs. Same DOM semantics as ``LinkExtractor``
    (script/style contents are CDATA, comments never surface) plus the
    text contract: character references inside the anchor are CONVERTED
    (``ref&#32;3`` reads back as ``ref 3``) and an ``<a>`` opening
    inside an open anchor implicitly closes it, per the HTML spec's
    no-nested-anchors rule."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.anchors: list[tuple[str, str]] = []
        self._href: str | None = None
        self._parts: list[str] = []

    def _close_open(self):
        if self._href is not None:
            self.anchors.append((self._href, "".join(self._parts)))
        self._href, self._parts = None, []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._close_open()
            for name, value in attrs:
                if name == "href" and value is not None:
                    self._href = value
                    break

    def handle_startendtag(self, tag, attrs):
        # <a href=... /> opens-and-closes: an empty-text anchor
        self.handle_starttag(tag, attrs)
        if tag == "a":
            self._close_open()

    def handle_endtag(self, tag):
        if tag == "a":
            self._close_open()

    def handle_data(self, data):
        if self._href is not None:
            self._parts.append(data)

    def close(self):
        super().close()
        self._close_open()


def extract_anchors(html: str) -> list[tuple[str, str]]:
    """All (href, text) anchor pairs in document order."""
    p = AnchorExtractor()
    p.feed(html)
    p.close()
    return p.anchors


class TableExtractor(HTMLParser):
    """Collect table cells as (row_idx, col_idx, text, is_header) with
    the same DOM semantics as the other extractors: script/style
    contents are CDATA (a ``<td>`` inside a script string never opens a
    cell), comments never surface, and character references inside
    cells are CONVERTED. ``row_idx`` counts ``<tr>`` per table (reset at
    ``<table>``); ``col_idx`` counts ``<td>``/``<th>`` per row. An
    opening ``<td>``/``<th>``/``<tr>`` implicitly closes any open cell
    (the HTML tree-construction rule browsers apply)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.cells: list[tuple[int, int, str, bool]] = []
        self._row = -1
        self._col = -1
        self._open: bool | None = None  # is_header of the open cell, if any
        self._parts: list[str] = []

    def _close_cell(self):
        if self._open is not None:
            self.cells.append((self._row, self._col, "".join(self._parts), self._open))
        self._open, self._parts = None, []

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._close_cell()
            self._row = -1
        elif tag == "tr":
            self._close_cell()
            self._row += 1
            self._col = -1
        elif tag in ("td", "th"):
            self._close_cell()
            self._col += 1
            self._open = tag == "th"

    def handle_endtag(self, tag):
        if tag in ("td", "th", "tr", "table"):
            self._close_cell()

    def handle_data(self, data):
        if self._open is not None:
            self._parts.append(data)

    def close(self):
        super().close()
        self._close_cell()


def extract_table_cells(html: str) -> list[tuple[int, int, str, bool]]:
    """All (row_idx, col_idx, text, is_header) cells in document order."""
    p = TableExtractor()
    p.feed(html)
    p.close()
    return p.cells
