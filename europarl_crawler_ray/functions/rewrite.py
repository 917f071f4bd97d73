"""Link rewriting (M11) — absolutize relative hrefs / script-src / img-src.

Semantics from the reference ``rewrite_links`` (``/root/reference/europarl/
downloader.py:117-138``): any element's ``href`` whose value has no netloc
and doesn't start with ``#`` is joined onto base_url; ``script[src]`` and
``img[src]`` likewise. The reference re-serializes the whole document
through bs4+lxml (which introduces serialization artifacts like
self-closing void tags); lxml is unavailable here, so this implementation
rewrites the attribute VALUES in place via html.parser offsets and leaves
every other byte untouched — a strictly smaller diff than the reference's
output, with the same link semantics. Divergence documented in
tests/test_rewrite.py.
"""

from __future__ import annotations

import urllib.parse
from html.parser import HTMLParser


class _LinkScanner(HTMLParser):
    def __init__(self, base_url: str):
        super().__init__(convert_charrefs=False)
        self.base_url = base_url
        self.edits: list[tuple[int, int, str]] = []  # (start, end, replacement)
        self._raw = ""

    def _should_rewrite(self, tag: str, attr: str, value: str | None) -> str | None:
        if value is None:
            return None
        if attr == "href":
            pass
        elif attr == "src" and tag in ("script", "img"):
            pass
        else:
            return None
        if urllib.parse.urlparse(value).netloc:
            return None
        if value.startswith("#"):
            return None
        return urllib.parse.urljoin(self.base_url, value)

    def _scan_tag(self, tag: str, attrs) -> None:
        # locate attribute values inside the raw tag text to edit in place
        start = self.getpos()
        raw = self.get_starttag_text() or ""
        offset = self._line_offsets[start[0] - 1] + start[1]
        for attr, value in attrs:
            new = self._should_rewrite(tag, attr, value)
            if new is None or value is None:
                continue
            for quote in ('"', "'"):
                needle = f"{attr}={quote}{value}{quote}"
                pos = raw.find(needle)
                if pos >= 0:
                    vstart = offset + pos + len(attr) + 2
                    self.edits.append((vstart, vstart + len(value), new))
                    break

    def handle_starttag(self, tag, attrs):
        self._scan_tag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self._scan_tag(tag, attrs)

    def rewrite(self, html: str) -> str:
        self._raw = html
        lines = html.split("\n")
        self._line_offsets = [0]
        for ln in lines[:-1]:
            self._line_offsets.append(self._line_offsets[-1] + len(ln) + 1)
        self.feed(html)
        self.close()
        out = []
        last = 0
        for s, e, repl in sorted(self.edits):
            out.append(html[last:s])
            out.append(repl)
            last = e
        out.append(html[last:])
        return "".join(out)


def rewrite_links(html: str, base_url: str) -> str:
    """Absolutize relative links against base_url (in-place edits only)."""
    return _LinkScanner(base_url).rewrite(html)
