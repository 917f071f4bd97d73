"""Frontier partitioning for Common-Crawl-shaped (multi-host, skewed)
url sets: host histogram pre-pass, hot-host salting, and a
politeness-partitioned fetch.

North-rule skew design (SURVEY §7.2): the frontier is partitioned by
``host`` so per-host politeness is enforced with ONE lease per group —
but a Zipf host distribution makes the hottest host's partition huge.
Salting splits hosts above a frequency threshold into ``k_host``
sub-partitions keyed ``host#salt`` (salt = url-hash % k); the politeness
coordinator still budgets per HOST (the salt only spreads the work), so
rate limits stay correct while no single task owns the hot host's tail.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from ..functions.canonical import hash_urls, hosts_vec
from ..stages.fetch import Fetcher


def with_host(ds: ray.data.Dataset, url_col: str = "url") -> ray.data.Dataset:
    def add(t: pa.Table) -> pa.Table:
        hosts = hosts_vec(t.column(url_col).to_pylist())
        return t.append_column("host", pa.array(hosts, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def host_histogram(ds: ray.data.Dataset, url_col: str = "url") -> pd.DataFrame:
    """The skew pre-pass: groupby(host).count(), small result."""
    return (
        with_host(ds, url_col)
        .groupby("host")
        .aggregate(Count(alias_name="n_urls"))
        .to_pandas()
        .sort_values("n_urls", ascending=False)
        .reset_index(drop=True)
    )


def salt_hot_hosts(
    ds: ray.data.Dataset,
    hot_hosts: dict[str, int] | None = None,
    hot_threshold: int = 10_000,
    k_host: int = 8,
    url_col: str = "url",
) -> ray.data.Dataset:
    """Adds ``host`` and ``part_key`` columns. Hosts above the threshold
    (measured by :func:`host_histogram` unless ``hot_hosts`` given) get
    ``host#salt`` keys with salt = url_hash % k; cold hosts keep ``host``.
    """
    if hot_hosts is None:
        hist = host_histogram(ds, url_col)
        hot_hosts = {
            r.host: k_host for r in hist.itertuples() if r.n_urls >= hot_threshold
        }
    hot_ref = ray.put(hot_hosts)

    def add_keys(t: pa.Table) -> pa.Table:
        hot = ray.get(hot_ref)
        urls = t.column(url_col).to_pylist()
        hosts = hosts_vec(urls)
        h1, _ = hash_urls(urls)
        keys = []
        for host, h in zip(hosts, h1):
            k = hot.get(host)
            keys.append(host if k is None else f"{host}#{int(h) % k}")
        out = t
        if "host" not in t.column_names:
            out = out.append_column("host", pa.array(hosts, pa.string()))
        return out.append_column("part_key", pa.array(keys, pa.string()))

    return ds.map_batches(add_keys, batch_format="pyarrow")


def politeness_partitioned_fetch(
    ds: ray.data.Dataset,
    coordinator,
    seed: int = 42,
    simulated: bool = True,
    page_scale: int = 1,
) -> ray.data.Dataset:
    """Fetch a salted frontier co-located by ``part_key``: ONE exchange on
    a coarse hash of ``part_key`` (the per-key shuffle semantics are
    preserved — every part_key's rows land in one task — but the task
    count stays ~256 instead of one Python-level group per host×salt,
    which is millions of groups at web scale; Fetcher already serializes
    per host inside the batch), then each task fetches through the shared
    per-host politeness budget (leases are per host — two salts of the
    same host draw from the same bucket)."""
    from .grouping import with_coarse_group

    def fetch_group(g: pa.Table) -> pa.Table:
        # stays Arrow end-to-end: the fetched rows carry html payloads and
        # a pandas round-trip would copy every blob through Python objects
        part_keys = g.column("part_key")
        g = g.drop_columns(["_g"])
        n = g.num_rows
        rulename = (
            g.column("rulename")
            if "rulename" in g.column_names
            else pa.array(["cc"] * n, pa.string())
        )
        t = pa.table(
            {
                "url": g.column("url"),
                "rulename": rulename,
                "date": pa.nulls(n, pa.date32()),
                "attempt": pa.array(np.zeros(n, dtype=np.int32)),
                "wave": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )
        fetched = Fetcher(
            coordinator=coordinator, seed=seed, simulated=simulated, page_scale=page_scale
        )(t)
        # positional re-attach of per-row part_keys relies on Fetcher
        # returning exactly the input rows in input order — enforce it
        assert fetched.num_rows == n, "Fetcher must preserve row count/order"
        return fetched.append_column("part_key", part_keys)

    return (
        with_coarse_group(ds, "part_key")
        .groupby("_g")
        .map_groups(fetch_group, batch_format="pyarrow")
    )


# ===================== robots.txt policy gate (RFC 9309, from scratch)

ROBOTS_UA = "europarl-bot/1.0"
N_ROBOTS_HOSTS = 40
_PATH_FAMILIES = 5


def robots_text_for_ruleset(rs: int) -> str:
    """Deterministic robots.txt corpus (what a real crawl would have
    FETCHED per host): four policy archetypes seen in the wild —
    allow-all, path blocks, deny-all-with-carve-out (longest-match
    precedence), and a bot-specific group that overrides the ``*`` group
    (RFC 9309 group selection)."""
    return [
        "User-agent: *\nDisallow:\n",
        "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n",
        "User-agent: *\nDisallow: /\nAllow: /public/\n",
        "User-agent: europarl-bot\nDisallow: /files/\n"
        "User-agent: *\nDisallow: /*.pdf$\nDisallow: /search\n",
    ][rs % 4]


def _frontier_paths(keys: np.ndarray) -> tuple[np.ndarray, list[str]]:
    fam = (keys % _PATH_FAMILIES).astype(np.int64)
    paths = [
        [
            f"/public/doc{k}.html",
            f"/private/doc{k}.html",
            f"/files/doc{k}.pdf",
            f"/tmp/cache{k}",
            f"/search?q={k}",
        ][f]
        for k, f in zip(keys, fam)
    ]
    return fam, paths


class RobotsGateStage:
    """Actor-pool stage (distinct from state/politeness.RobotsGate, the
    coordinator-side cache this shares its parser with): parse each
    host's robots.txt ONCE (cached in
    actor state, exactly how a fetch pipeline caches per-host matchers)
    and evaluate every frontier URL against it. The parse cost is
    per-HOST (bounded by the host universe); the per-URL regex match is
    the string-kernel floor."""

    def __init__(self, user_agent: str = ROBOTS_UA):
        from ..functions.robots import parse_robots

        self._parse = parse_robots
        self._ua = user_agent
        self._cache: dict[int, object] = {}

    def __call__(self, t: pa.Table) -> pa.Table:
        hids = t.column("hid").to_numpy()
        paths = t.column("path").to_pylist()
        allowed = np.empty(len(hids), dtype=np.int64)
        for i, (hid, path) in enumerate(zip(hids, paths)):
            m = self._cache.get(int(hid))
            if m is None:
                m = self._parse(robots_text_for_ruleset(int(hid) % 4), self._ua)
                self._cache[int(hid)] = m
            allowed[i] = int(m.allowed(path))
        return pa.table(
            {
                "url": t.column("url"),
                "hid": t.column("hid"),
                "ruleset": t.column("ruleset"),
                "allowed": pa.array(allowed, pa.int64()),
            }
        )


def q_robots_filter(sf_dir: str):
    """Frontier robots gate end to end: derive a multi-host URL frontier
    from ``orders`` (``N_ROBOTS_HOSTS`` hosts × five path families),
    evaluate every URL through the from-scratch RFC 9309 parser
    (functions/robots.py) against each host's robots.txt, and emit
    (url, hid, ruleset, allowed). The oracle replicates the DECISION
    table of the generated policies in SQL (the multimodal_meta
    pattern: SQL checks what the Ray side parsed+evaluated end to end),
    so a parser regression in group selection, longest-match precedence,
    wildcard or anchor handling flips ``allowed`` and fails the gate.

    Scale shape: pure map_batches + an actor-pool evaluation stage with
    per-actor host→matcher caches; no exchange at all — robots policy is
    embarrassingly parallel once the per-host texts are available."""
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )

    def frontier(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_numpy().astype(np.int64)
        hids = (t.column("o_custkey").to_numpy() % N_ROBOTS_HOSTS).astype(np.int64)
        _fam, paths = _frontier_paths(keys)
        urls = [f"https://host{h}.example{p}" for h, p in zip(hids, paths)]
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "hid": pa.array(hids, pa.int64()),
                "ruleset": pa.array(hids % 4, pa.int64()),
                "path": pa.array(paths, pa.string()),
            }
        )

    return orders.map_batches(frontier, batch_format="pyarrow").map_batches(
        RobotsGateStage, batch_format="pyarrow", concurrency=(1, 4)
    )


ROBOTS_FILTER_SQL = f"""
WITH f AS (
  SELECT o_orderkey AS k, o_custkey % {N_ROBOTS_HOSTS} AS hid,
         o_orderkey % {_PATH_FAMILIES} AS fam
  FROM orders),
d AS (
  SELECT k, hid, fam, hid % 4 AS rs,
         CASE fam
           WHEN 0 THEN '/public/doc' || k || '.html'
           WHEN 1 THEN '/private/doc' || k || '.html'
           WHEN 2 THEN '/files/doc' || k || '.pdf'
           WHEN 3 THEN '/tmp/cache' || k
           ELSE '/search?q=' || k END AS path
  FROM f)
SELECT 'https://host' || hid || '.example' || path AS url,
       CAST(hid AS BIGINT) AS hid,
       CAST(rs AS BIGINT) AS ruleset,
       CAST(CASE
         WHEN rs = 0 THEN 1
         WHEN rs = 1 THEN CASE WHEN fam IN (1, 3) THEN 0 ELSE 1 END
         WHEN rs = 2 THEN CASE WHEN fam = 0 THEN 1 ELSE 0 END
         ELSE CASE WHEN fam = 2 THEN 0 ELSE 1 END
       END AS BIGINT) AS allowed
FROM d
"""


FRONTIER_SQL_QUERIES: dict[str, tuple] = {
    "robots_filter": (q_robots_filter, ROBOTS_FILTER_SQL),
}
