"""Golden URL/term tests — values transcribed from the reference's own
parametrized tables (tests/rules/test_rule.py:10-27 and
tests/rules/test_protocol.py:8-111) plus coverage of all 23 rules."""

from datetime import date

import numpy as np
import pytest

from europarl_crawler_ray.functions import rules as R

GOLDEN_TERMS = [
    (date(2019, 8, 1), "9"),
    (date(2014, 8, 1), "8"),
    (date(2009, 8, 1), "7"),
    (date(2004, 8, 1), "6"),
    (date(1999, 8, 1), "5"),
    (date(1994, 8, 1), "4"),
    (date(1989, 8, 1), "3"),
    (date(1984, 8, 1), "2"),
    (date(1979, 8, 1), "1"),
    (date(1950, 8, 1), "0"),
    (date(2025, 8, 1), "0"),
]


@pytest.mark.parametrize("day,expected", GOLDEN_TERMS)
def test_get_term(day, expected):
    assert R.get_term(day) == expected


def test_get_term_vec_matches_scalar_over_full_range():
    days = np.arange(
        np.datetime64("1978-01-01"), np.datetime64("2026-01-01"), dtype="datetime64[D]"
    )
    vec = R.get_term_vec(days)
    pydays = days.astype("datetime64[D]").tolist()
    scalars = [R.get_term(d) for d in pydays]
    assert list(vec) == scalars


def test_term_boundary_exclusive_bounds():
    # exclusive bounds, first-match-wins: 1984-07-31 is NOT in term 1
    # (not < end) but IS in term 2 (> its start); 1984-07-01 stays term 1.
    assert R.get_term(date(1984, 7, 1)) == "1"
    assert R.get_term(date(1984, 7, 31)) == "2"
    assert R.get_term(date(1979, 7, 1)) == "0"  # not > start of term 1


GOLDEN_PROTOCOL_PDF = [
    (date(2019, 8, 1), "https://europarl.europa.eu/doceo/document/PV-9-2019-08-01_EN.pdf"),
    (date(2014, 8, 1), "https://europarl.europa.eu/doceo/document/PV-8-2014-08-01_EN.pdf"),
    (date(2009, 8, 1), "https://europarl.europa.eu/doceo/document/PV-7-2009-08-01_EN.pdf"),
    (date(2004, 8, 1), "https://europarl.europa.eu/doceo/document/PV-6-2004-08-01_EN.pdf"),
    (date(1999, 8, 1), "https://europarl.europa.eu/doceo/document/PV-5-1999-08-01_EN.pdf"),
    (date(1994, 8, 1), "https://europarl.europa.eu/doceo/document/PV-4-1994-08-01_EN.pdf"),
    (date(1989, 8, 1), "https://europarl.europa.eu/doceo/document/PV-3-1989-08-01_EN.pdf"),
    (date(1984, 8, 1), "https://europarl.europa.eu/doceo/document/PV-2-1984-08-01_EN.pdf"),
    (date(1979, 8, 1), "https://europarl.europa.eu/doceo/document/PV-1-1979-08-01_EN.pdf"),
    (date(1950, 8, 1), "https://europarl.europa.eu/doceo/document/PV-0-1950-08-01_EN.pdf"),
    (date(2025, 8, 1), "https://europarl.europa.eu/doceo/document/PV-0-2025-08-01_EN.pdf"),
]


@pytest.mark.parametrize("day,expected", GOLDEN_PROTOCOL_PDF)
def test_protocol_en_pdf_urls(day, expected):
    assert R.RULES_BY_NAME["protocol_en_pdf"].url(day) == expected


@pytest.mark.parametrize("day,expected", GOLDEN_PROTOCOL_PDF)
def test_protocol_en_html_urls(day, expected):
    assert R.RULES_BY_NAME["protocol_en_html"].url(day) == expected.replace(".pdf", ".html")


def test_registry_has_23_rules_with_reference_names():
    assert len(R.RULES) == 23
    assert len({r.name for r in R.RULES}) == 23
    # reference quirks kept verbatim
    assert R.RULES_BY_NAME["named_voting_fr_pdf"].format == ".xml"
    assert "voting_overview_de_Html" in R.RULES_BY_NAME


@pytest.mark.parametrize("rule", R.RULES, ids=lambda r: r.name)
def test_url_vec_matches_scalar(rule):
    days = np.arange(
        np.datetime64("1984-07-25"), np.datetime64("1984-08-05"), dtype="datetime64[D]"
    )
    vec = rule.url_vec(days)
    scalars = [rule.url(d) for d in days.astype("datetime64[D]").tolist()]
    assert list(vec) == scalars


def test_sample_urls_for_each_family():
    d = date(2020, 3, 9)
    assert (
        R.RULES_BY_NAME["word_protocol_de_html"].url(d)
        == "https://europarl.europa.eu/doceo/document/CRE-9-2020-03-09_DE.html"
    )
    assert (
        R.RULES_BY_NAME["agenda_en_pdf"].url(d)
        == "https://europarl.europa.eu/doceo/document/OJ-9-2020-03-09_EN.pdf"
    )
    assert (
        R.RULES_BY_NAME["daily_agenda_de_pdf"].url(d)
        == "https://europarl.europa.eu/doceo/document/OJQ-9-2020-03-09_DE.pdf"
    )
    assert (
        R.RULES_BY_NAME["named_voting_fr_xml"].url(d)
        == "https://europarl.europa.eu/doceo/document/PV-9-2020-03-09-RCV_FR.xml"
    )
    assert (
        R.RULES_BY_NAME["voting_overview_en_html"].url(d)
        == "https://europarl.europa.eu/doceo/document/PV-9-2020-03-09-VOT_EN.html"
    )


def test_spaced_out_dates_reference_shape():
    start = date(2021, 1, 1)
    out = R.spaced_out_dates(start)
    # 14 (step 1) + 7 (step 2) + 12 (step 5: 30..80) + 29 (step 10: 90..360)
    # ... computed from the reference loops, plus 3 century offsets
    offsets = [(start - d).days for d in out]
    expected = (
        [i for i in range(0, 14)]
        + [i for i in range(14, 28) if i % 2 == 0]
        + [i for i in range(28, 84) if i % 5 == 0]
        + [i for i in range(84, 365) if i % 10 == 0]
        + [100, 200, 300]
    )
    assert offsets == expected
