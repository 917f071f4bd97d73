"""Public-Suffix-List processing, from scratch against the
publicsuffix.org algorithm (https://publicsuffix.org/list/ — the spec,
not the dat file): rule parsing (comments, wildcard ``*.`` rules,
``!`` exception rules, implicit ``*`` default), longest-match lookup,
and registrable-domain extraction.

The embedded PSL-LITE ruleset is a deliberately small but
structurally complete instance — plain TLDs, multi-label suffixes,
a wildcard family with an exception, and the implicit default — enough
to exercise every branch of the algorithm. Swap ``PSL_LITE`` for the
real list text in production; the parser is format-faithful.

Used by pipelines/frontier_tools.q_registrable_domain (per-host crawl
aggregation needs the REGISTRABLE domain, not the hostname: politeness
and dedup at 100 TB group by site, and "a.shop.co.uk" and
"b.shop.co.uk" are the same site while "shop.co.uk" and "shop2.co.uk"
are not).
"""

from __future__ import annotations

PSL_LITE = """\
// PSL-LITE: structurally complete public-suffix ruleset
// plain TLDs
com
org
net
io
// multi-label suffixes
uk
co.uk
ac.uk
au
com.au
// wildcard family with an exception (the real list's *.ck / !www.ck)
*.ck
!www.ck
"""


def parse_psl(text: str) -> list[tuple[tuple[str, ...], bool]]:
    """[(labels_reversed, is_exception)] — comments/blank lines skipped;
    the implicit ``*`` default rule is appended (spec: 'If no rules
    match, the prevailing rule is "*"')."""
    rules: list[tuple[tuple[str, ...], bool]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("//"):
            continue
        exc = line.startswith("!")
        if exc:
            line = line[1:]
        rules.append((tuple(reversed(line.lower().split("."))), exc))
    rules.append((("*",), False))
    return rules


class PublicSuffixList:
    def __init__(self, text: str = PSL_LITE) -> None:
        self.rules = parse_psl(text)

    @staticmethod
    def _matches(rule: tuple[str, ...], labels_rev: tuple[str, ...]) -> bool:
        if len(rule) > len(labels_rev):
            return False
        return all(r == "*" or r == h for r, h in zip(rule, labels_rev))

    def public_suffix(self, host: str) -> str:
        """Longest matching rule wins; an exception rule beats any other
        and its suffix is the rule minus its leftmost label (spec step
        'If the prevailing rule is a exception rule, modify it by
        removing the leftmost label')."""
        labels_rev = tuple(reversed(host.lower().rstrip(".").split(".")))
        best: tuple[str, ...] | None = None
        best_exc = False
        for rule, exc in self.rules:
            if not self._matches(rule, labels_rev):
                continue
            if exc:  # exceptions take priority outright
                best, best_exc = rule, True
                break
            if best is None or len(rule) > len(best):
                best = rule
        assert best is not None  # the implicit '*' always matches
        n = len(best) - 1 if best_exc else len(best)
        return ".".join(reversed(labels_rev[:n]))

    def registrable_domain(self, host: str) -> str | None:
        """Public suffix plus one label; None when the host IS a public
        suffix (nothing registrable)."""
        suffix = self.public_suffix(host)
        labels = host.lower().rstrip(".").split(".")
        n_suf = len(suffix.split(".")) if suffix else 0
        if len(labels) <= n_suf:
            return None
        return ".".join(labels[len(labels) - n_suf - 1 :])
