"""From-scratch sitemap-XML codec (sitemaps.org protocol 0.9).

Covers the subset the protocol actually uses — ``<urlset>`` files with
``<url><loc>/<lastmod>`` children and ``<sitemapindex>`` files with
``<sitemap><loc>/<lastmod>`` children — parsed with a real scanning
tokenizer, not regexes over the document: XML comments are skipped (a
``<url>`` inside a comment is NOT an entry), the declaration/processing
instructions are skipped, attributes (``xmlns=...``) are tolerated, and
character/entity references in text are decoded (``&amp;`` in a
``<loc>`` reads back as ``&``). The renderer is the inverse (escaping
``& < >``), giving the byte-level round trip the tests pin.

No lxml/ElementTree in the pipeline path on purpose: the parser is the
operator under test (mirrors the repo's from-scratch HTML/PDF/WARC/
robots codecs), and stdlib ElementTree would reject the
entity-in-attribute edge cases real sitemaps contain anyway.
"""

from __future__ import annotations

_NAMED = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'"}


def xml_unescape(s: str) -> str:
    """Decode the five named references and numeric ``&#d;``/``&#xh;``."""
    if "&" not in s:
        return s
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "&":
            out.append(c)
            i += 1
            continue
        j = s.find(";", i + 1)
        if j == -1:
            out.append(c)
            i += 1
            continue
        ent = s[i + 1 : j]
        if ent in _NAMED:
            out.append(_NAMED[ent])
        elif ent.startswith("#x") or ent.startswith("#X"):
            out.append(chr(int(ent[2:], 16)))
        elif ent.startswith("#"):
            out.append(chr(int(ent[1:])))
        else:  # unknown entity: literal (lenient, like browsers)
            out.append(s[i : j + 1])
            i = j + 1
            continue
        i = j + 1
    return "".join(out)


def xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def parse_sitemap(xml: str) -> tuple[str, list[tuple[str, str | None]]]:
    """Parse a sitemap document → (root_tag, [(loc, lastmod|None), ...]).

    root_tag is ``urlset`` or ``sitemapindex``; entries appear in
    document order. Raises ValueError on a root that is neither, or on
    an entry with no ``<loc>``.
    """
    i, n = 0, len(xml)
    root: str | None = None
    stack: list[str] = []
    text: list[str] = []
    cur_loc: str | None = None
    cur_mod: str | None = None
    entries: list[tuple[str, str | None]] = []

    while i < n:
        lt = xml.find("<", i)
        if lt == -1:
            break
        if stack and stack[-1] in ("loc", "lastmod"):
            text.append(xml[i:lt])
        if xml.startswith("<!--", lt):
            end = xml.find("-->", lt + 4)
            i = n if end == -1 else end + 3
            continue
        if xml.startswith("<?", lt):
            end = xml.find("?>", lt + 2)
            i = n if end == -1 else end + 2
            continue
        if xml.startswith("<!", lt):  # DOCTYPE etc.
            end = xml.find(">", lt + 2)
            i = n if end == -1 else end + 1
            continue
        gt = xml.find(">", lt + 1)
        if gt == -1:
            break
        tag_body = xml[lt + 1 : gt].strip()
        i = gt + 1
        if tag_body.startswith("/"):  # closing tag
            name = tag_body[1:].strip().split(":")[-1]
            if stack and stack[-1] == name:
                stack.pop()
            if name == "loc":
                cur_loc = xml_unescape("".join(text).strip())
                text = []
            elif name == "lastmod":
                cur_mod = xml_unescape("".join(text).strip())
                text = []
            elif name in ("url", "sitemap"):
                if cur_loc is None:
                    raise ValueError(f"<{name}> entry without <loc>")
                entries.append((cur_loc, cur_mod))
                cur_loc, cur_mod = None, None
            continue
        self_closing = tag_body.endswith("/")
        name = tag_body.rstrip("/").split()[0].split(":")[-1]
        if root is None:
            root = name
        if not self_closing:
            stack.append(name)
            if name in ("loc", "lastmod"):
                text = []

    if root not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap document (root={root!r})")
    return root, entries


_XMLNS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def render_urlset(entries: list[tuple[str, str | None]]) -> str:
    """entries = [(loc, lastmod|None)] → urlset XML (with the decoys a
    regex 'parser' trips on: a commented-out entry and escaped text)."""
    rows = []
    for loc, mod in entries:
        mod_el = f"<lastmod>{mod}</lastmod>" if mod is not None else ""
        rows.append(f"  <url><loc>{xml_escape(loc)}</loc>{mod_el}</url>")
    body = "\n".join(rows)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<urlset xmlns="{_XMLNS}">\n'
        "  <!-- <url><loc>https://decoy.example/nope</loc></url> -->\n"
        f"{body}\n"
        "</urlset>\n"
    )


def render_sitemap_index(locs: list[str]) -> str:
    rows = "\n".join(
        f"  <sitemap><loc>{xml_escape(loc)}</loc></sitemap>" for loc in locs
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<sitemapindex xmlns="{_XMLNS}">\n'
        "  <!-- <sitemap><loc>https://decoy.example/nope.xml</loc></sitemap> -->\n"
        f"{rows}\n"
        "</sitemapindex>\n"
    )
