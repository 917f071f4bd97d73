"""Backfill — the rebuild of ``eurocli download sessions``
(``/root/reference/europarl/eurocli.py:281-359`` →
``downloader.download_all_docs``): the DB-free path that walks dates from
a ledger, probes the session day, downloads every session-doc rule for
confirmed dates, rewrites relative links in HTML before storing (M11,
``downloader.py:104-107``), and appends done dates to an append-only
ledger file (S8, ``downloader.py:16-36`` / ``eurocli.py:346-356``).

Ray-Data-shaped: the date batch is a small Dataset, fetch+rewrite+store
happen in ``map_batches`` tasks, the ledger append is the driver-side
commit point (dates only; tiny).
"""

from __future__ import annotations

import os
from datetime import date

import pyarrow as pa
import ray.data

from ..functions.rewrite import rewrite_links
from ..functions.rules import BASE_URL, DOCUMENT_RULES, SESSION_DAY_RULE, spaced_out_dates
from ..sources.synth import MockHttp

LEDGER_NAME = "backfilled_dates.txt"


def read_ledger(directory: str) -> set[str]:
    path = os.path.join(directory, LEDGER_NAME)
    if not os.path.exists(path):
        return set()
    with open(path) as f:
        return {line.strip() for line in f if line.strip()}


def append_ledger(directory: str, days: list[date]) -> None:
    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, LEDGER_NAME), "a") as f:
        for d in days:
            f.write(d.isoformat() + "\n")


def get_unviewed_dates(directory: str, start: date, limit: int) -> list[date]:
    """Newest-first dates not yet in the ledger (reference
    get_unviewed_date, generalized to a batch)."""
    done = read_ledger(directory)
    out: list[date] = []
    d = start
    floor = date(1979, 7, 1)  # reference downloader.py:26
    while d >= floor and len(out) < limit:
        if d.isoformat() not in done:
            out.append(d)
        d = d.fromordinal(d.toordinal() - 1)
    return out


def backfill(
    basedir: str,
    anchor: date,
    spaced: bool = True,
    limit: int = 50,
    seed: int = 42,
) -> dict:
    """Download session docs for a ledger-driven date batch; returns counts.

    ``spaced=True`` uses the reference's recrawl schedule
    (spaced_out_dates, M10); otherwise newest-first unviewed dates."""
    days = (
        [d for d in spaced_out_dates(anchor) if d.isoformat() not in read_ledger(basedir)]
        if spaced
        else get_unviewed_dates(basedir, anchor, limit)
    )
    days = days[:limit]
    if not days:
        return {"dates": 0, "stored": 0}

    t = pa.table({"date": pa.array(days, pa.date32())})

    def fetch_store(batch: pa.Table) -> pa.Table:
        http = MockHttp(seed)

        def fetch_retry(url: str, rulename: str, retries: int = 3):
            # the reference's serial path retries each request up to 3
            # times before giving up (downloader.py scrape_document)
            for attempt in range(retries):
                st, body, red = http.fetch(url, attempt, rulename)
                if st == 200:
                    return st, body, red
            return st, body, red

        stored = []
        for d in batch.column("date").to_pylist():
            n = 0
            status, _, _ = fetch_retry(SESSION_DAY_RULE.url(d), SESSION_DAY_RULE.name)
            if status == 200:
                for rule in DOCUMENT_RULES:
                    st, body, _ = fetch_retry(rule.url(d), rule.name)
                    if st != 200 or body is None:
                        continue
                    # store layout {basedir}/{YYYY-MM-DD}/{rulename}{format}
                    # (reference Rule.store_document, rule.py:98-117), with
                    # link rewriting before store for html (M11)
                    ddir = os.path.join(basedir, d.isoformat())
                    os.makedirs(ddir, exist_ok=True)
                    path = os.path.join(ddir, rule.name + rule.format)
                    if rule.format == ".html":
                        html = rewrite_links(body.decode("utf-8"), BASE_URL)
                        with open(path, "w") as f:
                            f.write(html)
                    else:
                        with open(path, "wb") as f:
                            f.write(body)
                    n += 1
            stored.append(n)
        return batch.append_column("n_stored", pa.array(stored, pa.int64()))

    out = (
        ray.data.from_arrow(t)
        .repartition(max(1, len(days) // 8))
        .map_batches(fetch_store, batch_format="pyarrow")
        .to_pandas()
    )
    append_ledger(basedir, days)
    return {"dates": len(days), "stored": int(out["n_stored"].sum())}
