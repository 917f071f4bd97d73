"""Skew handling: host histogram, hot-host salting, politeness-partitioned
fetch over a Zipf-skewed CC-style frontier; robots gating; real-time
(non-simulated) politeness pacing."""

import time

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from europarl_crawler_ray.pipelines.frontier_tools import (
    host_histogram,
    politeness_partitioned_fetch,
    salt_hot_hosts,
)
from europarl_crawler_ray.sources.synth import cc_urls
from europarl_crawler_ray.stages.fetch import ROBOTS_BLOCKED, Fetcher
from europarl_crawler_ray.state.politeness import PolitenessCoordinator


@pytest.fixture()
def frontier(ray_session):
    urls = cc_urls(5000, n_hosts=50, zipf_a=1.3)
    return ray.data.from_arrow(pa.table({"url": pa.array(urls.tolist(), pa.string())}))


def test_host_histogram_shows_zipf_skew(frontier):
    hist = host_histogram(frontier)
    assert hist.iloc[0]["host"] == "host00000.example.org"
    assert hist.iloc[0]["n_urls"] > 10 * hist.iloc[-1]["n_urls"]
    assert hist["n_urls"].sum() == 5000


def test_salting_splits_hot_hosts_only(frontier):
    hist = host_histogram(frontier)
    cold_host = hist.iloc[-1]["host"]  # a genuinely sub-threshold host
    assert hist.iloc[-1]["n_urls"] < 500
    ds = salt_hot_hosts(frontier, hot_threshold=500, k_host=4)
    df = ds.to_pandas()
    hot = df[df["host"] == "host00000.example.org"]
    cold = df[df["host"] == cold_host]
    assert hot["part_key"].nunique() == 4
    assert set(hot["part_key"]) == {f"host00000.example.org#{i}" for i in range(4)}
    assert (cold["part_key"] == cold_host).all()
    # salting bounds the biggest partition
    sizes = df.groupby("part_key").size()
    assert sizes.max() < len(hot) * 0.5 + 50


def test_partitioned_fetch_respects_budget_and_fetches_all(ray_session, frontier):
    coord = PolitenessCoordinator.options(num_cpus=0).remote(simulated=True)
    ds = salt_hot_hosts(frontier, hot_threshold=500, k_host=4)
    out = politeness_partitioned_fetch(ds, coord).to_pandas()
    assert len(out) == 5000
    assert (out["status_code"] > 0).all()
    # per-HOST throttle state exists (salts share the host bucket)
    intervals = ray.get(coord.intervals.remote())
    assert "host00000.example.org" in intervals
    summary = ray.get(coord.status_summary.remote())
    assert sum(summary.values()) == 5000


def test_robots_gating_blocks_disallowed_paths(ray_session):
    # mock robots.txt disallows /private/ on every host
    coord = PolitenessCoordinator.options(num_cpus=0).remote(simulated=True)
    urls = [
        "https://hostx.example.org/private/secret1",
        "https://hostx.example.org/public/page1",
        "https://hostx.example.org/private/secret2",
    ]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "rulename": pa.array(["cc"] * 3),
            "date": pa.array([None] * 3, pa.date32()),
            "attempt": pa.array([0] * 3, pa.int32()),
            "wave": pa.array([0] * 3, pa.int32()),
        }
    )
    out = Fetcher(coordinator=coord)(t)
    st = dict(zip(out.column("url").to_pylist(), out.column("status_code").to_pylist()))
    assert st[urls[0]] == ROBOTS_BLOCKED
    assert st[urls[2]] == ROBOTS_BLOCKED
    assert st[urls[1]] != ROBOTS_BLOCKED
    assert out.column("html")[0].as_py() is None


def test_real_time_politeness_paces_requests(ray_session):
    """Non-simulated mode: fetching n urls from one host takes at least
    (n - initial_tokens) * interval wall-clock seconds."""
    coord = PolitenessCoordinator.options(num_cpus=0).remote(
        min_interval=0.05, simulated=False
    )
    n = 10
    urls = [f"https://slowhost.example.org/page/{i}" for i in range(n)]
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "rulename": pa.array(["cc"] * n),
            "date": pa.array([None] * n, pa.date32()),
            "attempt": pa.array([0] * n, pa.int32()),
            "wave": pa.array([0] * n, pa.int32()),
        }
    )
    t0 = time.perf_counter()
    out = Fetcher(coordinator=coord, simulated=False, max_wait_s=1.0)(t)
    elapsed = time.perf_counter() - t0
    assert out.num_rows == n
    assert elapsed >= 0.3, elapsed  # ~n * 0.05s of token accrual
