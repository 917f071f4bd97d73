"""Differential fuzz harness against the REAL reference dependencies
(VERDICT r4 missing #1): when beautifulsoup4 / pdfminer.six ARE
importable, fuzz the from-scratch reimplementations —
``functions/extract.get_text`` (bs4-4.9.3 ``html.parser`` get_text
semantics, reference europarl/rules/extraction.py:40-45) and
``functions/pdf.pdf_to_text`` (pdfminer-shaped text) — against the real
libraries over the synthetic corpus plus seeded random mutations.

This sandbox ships neither package, so every test here skips; on a
machine WITH them the harness either passes or turns a divergence into
a concrete reproducer string (printed in the assert) to be pinned as a
golden fixture in tests/test_extract.py / tests/test_pdf.py."""

import random
import string
from datetime import date

import pytest

bs4 = pytest.importorskip("bs4", reason="differential harness needs real bs4")

from europarl_crawler_ray.functions.extract import get_text  # noqa: E402

TAGS = ["p", "div", "span", "b", "i", "a", "ul", "li", "table", "tr", "td",
        "h1", "br", "hr", "img", "script", "style", "title", "pre"]
ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;", "&eacute;",
            "&#65;", "&#x1F600;", "&#xg;", "&unknown;", "&", "&#", "&#x"]
SNIPPETS = ["<!-- comment -->", "<!-- unterminated", "<![CDATA[raw]]>",
            "<!DOCTYPE html>", "<?php noise ?>", "</missing>", "<>",
            "< notatag", "<p", "<p attr='unclosed"]


def _rand_html(rng: random.Random, depth: int = 0) -> str:
    parts = []
    for _ in range(rng.randint(1, 6)):
        kind = rng.randint(0, 9)
        if kind <= 3:
            parts.append(
                "".join(rng.choice(string.printable[:70] + "äé€ ")
                        for _ in range(rng.randint(0, 12)))
            )
        elif kind <= 5:
            parts.append(rng.choice(ENTITIES))
        elif kind <= 7 and depth < 4:
            tag = rng.choice(TAGS)
            inner = _rand_html(rng, depth + 1)
            close = rng.random() < 0.85
            parts.append(f"<{tag}>{inner}" + (f"</{tag}>" if close else ""))
        else:
            parts.append(rng.choice(SNIPPETS))
    return "".join(parts)


class TestHtmlGetTextParity:
    def _assert_parity(self, html: str):
        theirs = bs4.BeautifulSoup(html, "html.parser").get_text()
        ours = get_text(html)
        assert ours == theirs, f"get_text divergence on: {html!r}"

    def test_synthetic_corpus_pages(self):
        from europarl_crawler_ray.functions.rules import RULES
        from europarl_crawler_ray.sources.synth import render_html

        for rule in RULES[:8]:
            html = render_html(
                f"https://www.europarl.europa.eu/x?d={rule.name}",
                rule.name, date(2019, 7, 3), "EN",
            )
            self._assert_parity(
                html.decode("utf-8") if isinstance(html, bytes) else html
            )

    @pytest.mark.parametrize("seed", range(200))
    def test_fuzzed_html(self, seed):
        self._assert_parity(_rand_html(random.Random(seed)))

    @pytest.mark.parametrize("seed", range(100))
    def test_mutated_real_page(self, seed):
        """Random byte-level mutations of a well-formed page — truncation,
        splice, entity corruption — the classes real crawls hit."""
        from europarl_crawler_ray.sources.synth import render_html

        from europarl_crawler_ray.functions.rules import RULES

        base = render_html(
            "https://www.europarl.europa.eu/doceo/document/A-9-2021-0001_EN.html",
            RULES[0].name, date(2021, 3, 9), "EN",
        )
        base = base.decode("utf-8") if isinstance(base, bytes) else base
        rng = random.Random(10_000 + seed)
        mode = rng.randint(0, 2)
        if mode == 0:
            html = base[: rng.randint(0, len(base))]
        elif mode == 1:
            cut = rng.randint(0, len(base) - 1)
            html = base[:cut] + rng.choice(ENTITIES + SNIPPETS) + base[cut:]
        else:
            pos = rng.randint(0, max(len(base) - 10, 1))
            html = base[:pos] + base[pos:].replace("<", "&lt;", 1)
        self._assert_parity(html)


class TestPdfToTextParity:
    @pytest.fixture(autouse=True)
    def _need_pdfminer(self):
        pytest.importorskip(
            "pdfminer.high_level", reason="differential harness needs pdfminer"
        )

    def _assert_parity(self, data: bytes, label: str):
        import io

        from pdfminer.high_level import extract_text

        from europarl_crawler_ray.functions.pdf import pdf_to_text

        theirs = extract_text(io.BytesIO(data))
        ours = pdf_to_text(data)
        assert ours == theirs, f"pdf_to_text divergence on case {label}"

    @pytest.mark.parametrize("seed", range(50))
    def test_rendered_pdfs(self, seed):
        from europarl_crawler_ray.functions.pdf import render_pdf_text

        rng = random.Random(seed)
        words = [
            "".join(rng.choice(string.ascii_letters) for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 120))
        ]
        self._assert_parity(render_pdf_text(" ".join(words)), f"seed{seed}")

    @pytest.mark.parametrize("compress", [False, True])
    def test_synth_corpus_pdfs(self, compress):
        from europarl_crawler_ray.functions.pdf import render_pdf_text

        text = "Minutes of proceedings\nSitting of 2019-07-03\n" * 20
        try:
            data = render_pdf_text(text, compress=compress)
        except TypeError:  # renderer without a compress knob
            data = render_pdf_text(text)
        self._assert_parity(data, f"compress={compress}")
