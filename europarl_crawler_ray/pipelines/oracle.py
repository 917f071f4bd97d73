"""Straight-line serial oracle of the reference crawl loop.

An INDEPENDENT re-statement of the reference's discovery/expansion
semantics (SessionDay.get_unchecked_days sessionDay.py:53-122,
URLs.get_todo_rule_and_date_combos url.py:94-137, UNIQUE-upsert dedup
url.py:71-92) used ONLY to test the Ray driver's wave equivalence:
same per-wave probe membership, same generated-url set, same final
URL-seen set. Deliberately written as a dumb single-process loop over
plain dicts/sets — do not share code with pipelines/crawl.py.
"""

from __future__ import annotations

from datetime import date, timedelta

from ..functions.rules import RULES_BY_NAME, SESSION_DAY_RULE, DOCUMENT_RULES
from ..sources.synth import MockHttp


def oracle_crawl(
    start_date: date,
    today: date,
    offset_days: int = 30,
    discovery_limit: int = 10,
    expansion_limit: int = 50,
    active_rule_names: list[str] | None = None,
    seed: int = 42,
    max_waves: int = 10_000,
):
    http = MockHttp(seed)
    rules = (
        [RULES_BY_NAME[n] for n in active_rule_names]
        if active_rule_names is not None
        else list(DOCUMENT_RULES)
    )
    horizon = today - timedelta(days=offset_days)

    probed_done: set[date] = set()
    confirmed: set[date] = set()
    retry: dict[date, int] = {}
    # seen key = (rulename, url) pair, mirroring UNIQUE(rule_id, url)
    urls_seen: set[tuple[str, str]] = set()
    fetched_pages: list[tuple[str, int]] = []
    waves: list[dict] = []

    for _wave in range(max_waves):
        # --- F3: (new DESC LIMIT l-1) UNION (retry LIMIT l) ORDER ASC LIMIT l
        known = probed_done | set(retry)
        new_dates = []
        d = horizon
        while d >= start_date and len(new_dates) < discovery_limit - 1:
            if d not in known:
                new_dates.append(d)
            d -= timedelta(days=1)
        batch = sorted(new_dates + sorted(retry)[:discovery_limit])[:discovery_limit]

        if not batch and not _has_todo(confirmed, urls_seen, rules):
            break

        probe_dates = list(batch)
        for d in batch:
            url = SESSION_DAY_RULE.url(d)
            urls_seen.add((SESSION_DAY_RULE.name, url))
            status, _, _ = http.fetch(url, retry.get(d, 0), SESSION_DAY_RULE.name)
            if status in (200, 404):
                probed_done.add(d)
                retry.pop(d, None)
                if status == 200:
                    confirmed.add(d)
            else:
                retry[d] = retry.get(d, 0) + 1

        # --- F2: confirmed × rules anti-join urls, dates DESC, LIMIT rows
        combos = []
        for d in sorted(confirmed, reverse=True):
            for r in rules:
                if (r.name, r.url(d)) not in urls_seen:
                    combos.append((d, r))
            if len(combos) >= expansion_limit:
                break
        combos = combos[:expansion_limit]
        wave_urls = []
        for d, r in combos:
            u = r.url(d)
            urls_seen.add((r.name, u))
            wave_urls.append((r.name, u))
            status, body, _ = http.fetch(u, 0, r.name)
            if status == 200 and body is not None:
                fetched_pages.append((u, len(body)))

        waves.append({"probe_dates": probe_dates, "urls": wave_urls})

    return {
        "waves": waves,
        "urls_seen": urls_seen,
        "confirmed": confirmed,
        "pages": fetched_pages,
    }


def _has_todo(confirmed, urls_seen, rules) -> bool:
    return any((r.name, r.url(d)) not in urls_seen for d in confirmed for r in rules)
