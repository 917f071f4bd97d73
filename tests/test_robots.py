"""RFC 9309 robots parser semantics: longest-match precedence, the
Allow-wins-ties rule, * and $ wildcards, group selection by user-agent
specificity, and the end-to-end frontier gate. Oracle parity of
q_robots_filter is covered by the gate."""

from europarl_crawler_ray.functions.robots import parse_robots
from europarl_crawler_ray.pipelines.frontier_tools import (
    ROBOTS_UA,
    robots_text_for_ruleset,
)


def test_longest_match_wins():
    m = parse_robots("User-agent: *\nDisallow: /\nAllow: /public/\n", "bot")
    assert m.allowed("/public/x.html")
    assert not m.allowed("/private/x.html")
    assert not m.allowed("/")


def test_allow_wins_ties():
    # equal-length patterns: RFC 9309 resolves Allow over Disallow
    m = parse_robots("User-agent: *\nDisallow: /dir/\nAllow: /dir/\n", "bot")
    assert m.allowed("/dir/page")


def test_wildcard_and_anchor():
    m = parse_robots("User-agent: *\nDisallow: /*.pdf$\n", "bot")
    assert not m.allowed("/a/b/c.pdf")
    assert m.allowed("/a/b/c.pdf.html")  # $ anchors at end
    assert m.allowed("/a/b/c.html")


def test_empty_disallow_allows_all():
    m = parse_robots("User-agent: *\nDisallow:\n", "bot")
    assert m.allowed("/anything")


def test_group_selection_specific_over_star():
    txt = (
        "User-agent: europarl-bot\nDisallow: /files/\n"
        "User-agent: *\nDisallow: /\n"
    )
    m = parse_robots(txt, "europarl-bot/1.0")
    assert not m.allowed("/files/x")
    assert m.allowed("/anything-else")  # the * deny-all group is ignored
    other = parse_robots(txt, "somebot")
    assert not other.allowed("/anything-else")  # falls back to *


def test_group_selection_longest_token():
    txt = (
        "User-agent: bot\nDisallow: /a/\n"
        "User-agent: europarl-bot\nDisallow: /b/\n"
    )
    m = parse_robots(txt, "europarl-bot/1.0")
    assert m.allowed("/a/x") and not m.allowed("/b/x")


def test_multiple_ua_lines_share_group_and_comments():
    txt = (
        "# policy\n"
        "User-agent: alpha\n"
        "User-agent: beta\n"
        "Disallow: /x/  # trailing comment\n"
    )
    for ua in ("alpha", "beta"):
        m = parse_robots(txt, ua)
        assert not m.allowed("/x/1")
        assert m.allowed("/y/1")


def test_no_matching_rule_allows():
    m = parse_robots("User-agent: *\nDisallow: /secret\n", "bot")
    assert m.allowed("/open")


def test_ruleset_corpus_decisions():
    # the synthetic per-host policies drive the oracle's decision table —
    # pin each archetype through the real parser
    m0 = parse_robots(robots_text_for_ruleset(0), ROBOTS_UA)
    assert m0.allowed("/private/doc1.html")
    m1 = parse_robots(robots_text_for_ruleset(1), ROBOTS_UA)
    assert not m1.allowed("/private/doc1.html")
    assert not m1.allowed("/tmp/cache9")
    assert m1.allowed("/public/doc1.html")
    m2 = parse_robots(robots_text_for_ruleset(2), ROBOTS_UA)
    assert m2.allowed("/public/doc1.html")
    assert not m2.allowed("/search?q=1")
    m3 = parse_robots(robots_text_for_ruleset(3), ROBOTS_UA)
    assert not m3.allowed("/files/doc1.pdf")
    assert m3.allowed("/search?q=1")  # * group overridden by bot group
