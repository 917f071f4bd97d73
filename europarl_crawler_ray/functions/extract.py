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


class _TextCollector(HTMLParser):
    """Collects exactly the strings bs4-4.9.3 ``get_text()`` would join."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self._run: list[str] = []          # consecutive data chunks buffer
        self._cdata_skip: str | None = None  # inside <script>/<style>
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

    # -- parser events --------------------------------------------------
    def handle_data(self, data: str) -> None:
        self._run.append(data)

    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag in _CDATA_ELEMS:
            self._cdata_skip = tag
        elif tag == "template":
            self._template_depth += 1
        elif tag in _PRESERVE_WS:
            self._preserve_ws_depth += 1

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if self._cdata_skip is not None:
            if tag == self._cdata_skip:
                self._cdata_skip = None
        elif tag == "template":
            self._template_depth = max(0, self._template_depth - 1)
        elif tag in _PRESERVE_WS:
            self._preserve_ws_depth = max(0, self._preserve_ws_depth - 1)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # Self-closing <script/> etc. never enters CDATA mode; a tree event
        # still flushes the pending run.
        self._flush()

    def handle_comment(self, data: str) -> None:
        self._flush()  # Comment nodes are excluded from get_text

    def handle_decl(self, decl: str) -> None:
        self._flush()  # Doctype — excluded

    def handle_pi(self, data: str) -> None:
        self._flush()  # ProcessingInstruction — excluded

    def unknown_decl(self, data: str) -> None:
        # bs4 turns <![CDATA[x]]> into CData("x"), which IS included by the
        # 4.9.3 get_text default (types=(NavigableString, CData)); other
        # marked sections become Declaration — excluded. CData bypasses the
        # template/script containment because endData(CData) keeps the class.
        self._flush()
        if data.startswith("CDATA["):
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
