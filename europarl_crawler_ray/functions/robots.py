"""From-scratch robots.txt parser/evaluator per RFC 9309.

The reference crawler targets a single cooperative host and ships no
robots handling (its politeness is the token-bucket family,
state/politeness.py); a general web crawl at 100 TB must evaluate
robots.txt per host before fetching. Implemented from the RFC, not from
any existing library:

- line syntax: ``key: value`` records, ``#`` comments, keys
  case-insensitive (§2.1); unknown keys ignored.
- groups: consecutive ``User-agent`` lines open a group that the
  following ``Allow``/``Disallow`` rules join (§2.2.1); a crawler obeys
  ONLY the group(s) with the most specific matching user-agent (longest
  product-token match, case-insensitive), falling back to ``*`` (§2.2.1);
  multiple groups selected at the same specificity merge.
- matching: rules are path prefixes with ``*`` (any octets) and a final
  ``$`` (end anchor) (§2.2.3); the rule with the LONGEST pattern wins;
  an Allow/Disallow tie at the same length resolves to Allow (§2.2.2);
  no matching rule -> allowed; empty Disallow value -> allow-all record.
"""

from __future__ import annotations

import re


class RobotsMatcher:
    """Compiled decision function for one (robots.txt, user-agent)."""

    def __init__(self, rules: list[tuple[bool, str]]):
        # rules: (is_allow, raw_pattern); compile once, longest-first so
        # the first hit decides (stable sort keeps Allow before Disallow
        # at equal length -> the RFC's tie-goes-to-Allow for free)
        prepared = sorted(
            rules, key=lambda r: (-len(r[1]), not r[0])
        )
        self._compiled: list[tuple[bool, re.Pattern]] = [
            (allow, self._compile(pat)) for allow, pat in prepared
        ]

    @staticmethod
    def _compile(pattern: str) -> re.Pattern:
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
        return re.compile(rx + (r"\Z" if anchored else ""))

    def allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        for allow, rx in self._compiled:
            if rx.match(path):
                return allow
        return True  # no applicable rule


def parse_robots(text: str, user_agent: str) -> RobotsMatcher:
    """Parse ``text`` and return the matcher for ``user_agent``."""
    ua = user_agent.lower()
    # group collection: list of (ua_tokens, rules)
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_uas: list[str] = []
    cur_rules: list[tuple[bool, str]] | None = None
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if cur_rules is not None:  # a rule line closed the last group
                groups.append((cur_uas, cur_rules))
                cur_uas, cur_rules = [], None
            cur_uas.append(value.lower())
        elif key in ("allow", "disallow"):
            if not cur_uas:
                continue  # rule before any user-agent line: ignored
            if cur_rules is None:
                cur_rules = []
            if value == "":
                continue  # empty pattern matches nothing (allow-all record)
            cur_rules.append((key == "allow", value))
        # other keys (crawl-delay, sitemap, ...) don't affect matching
    if cur_uas:
        groups.append((cur_uas, cur_rules or []))

    # group selection: longest user-agent token that occurs in ours wins
    best_len, best_rules = -1, []
    star_rules: list[tuple[bool, str]] = []
    for uas, rules in groups:
        for tok in uas:
            if tok == "*":
                star_rules.extend(rules)
            elif tok and tok in ua:
                if len(tok) > best_len:
                    best_len, best_rules = len(tok), list(rules)
                elif len(tok) == best_len:
                    best_rules.extend(rules)
    return RobotsMatcher(best_rules if best_len >= 0 else star_rules)
