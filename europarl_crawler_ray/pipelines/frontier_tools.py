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
