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


# --------------------------------------- url_canonicalize + revalidate


def test_url_canonicalize_collapses_all_families(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.frontier_tools import (
        URLC_N_HOSTS,
        q_url_canonicalize,
    )

    n = 24
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = q_url_canonicalize(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # whatever the messy family, the canonical form is the clean url
    for i in range(n):
        g = i % URLC_N_HOSTS
        assert df.loc[i, "url_canonical"] == f"https://site{g}.example/path/{i}?a=1&b=2"
    assert df["fam"].between(0, 5).all()


def test_revalidate_plan_decision_table(ray_session, tmp_path):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.functions.dedup import md5_hash64
    from europarl_crawler_ray.pipelines.frontier_tools import (
        REVAL_HEADER_BYTES,
        q_revalidate_plan,
    )

    dates = pd.to_datetime(
        ["2001-12-31", "2001-12-02", "1999-06-15", "1995-01-01"]
    )
    keys = [3, 50007, 12, 999]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(keys, pa.int64()),
                "o_custkey": pa.array([1] * 4, pa.int64()),
                "o_orderstatus": pa.array(["O"] * 4),
                "o_totalprice": pa.array([1.0] * 4),
                "o_orderdate": pa.array(dates, pa.timestamp("us")),
                "o_orderpriority": pa.array(["1-URGENT"] * 4),
            }
        ),
        tmp_path / "orders.parquet",
    )
    df = q_revalidate_plan(str(tmp_path)).to_pandas().set_index("o_orderkey")
    anchor = pd.Timestamp("2002-01-01")
    for k, d in zip(keys, dates):
        h = int(md5_hash64([f"hdr:{k}"])[0])
        has_etag, has_lastmod = h % 2 == 1, (h >> 1) % 2 == 1
        max_age, changed = (h >> 2) % 30, (h >> 7) % 4 == 0
        cache_age = (anchor - d).days % 60
        row = df.loc[k]
        assert row["cache_age"] == cache_age
        if cache_age <= max_age:
            assert row["decision"] == "fresh" and row["est_bytes"] == 0
        elif has_etag or has_lastmod:
            assert row["decision"] == (
                "revalidate_etag" if has_etag else "revalidate_lastmod"
            )
            want = (k % 50000 + REVAL_HEADER_BYTES) if changed else REVAL_HEADER_BYTES
            assert row["est_bytes"] == want
        else:
            assert row["decision"] == "refetch"
            assert row["est_bytes"] == k % 50000 + REVAL_HEADER_BYTES


def test_recrawl_intervals_fold(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.functions.dedup import md5_hash64
    from europarl_crawler_ray.pipelines.frontier_tools import (
        RECRAWL_INIT_DAYS,
        RECRAWL_MAX_DAYS,
        RECRAWL_MIN_DAYS,
        RECRAWL_VISITS,
        q_recrawl_intervals,
    )

    n = 64
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([1] * n, pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    df = q_recrawl_intervals(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    for i in range(n):
        h = int(md5_hash64([f"chg:{i}"])[0])
        iv, changes = RECRAWL_INIT_DAYS, 0
        for k in range(1, RECRAWL_VISITS + 1):
            if (h >> k) & 1:
                changes += 1
                iv = max(RECRAWL_MIN_DAYS, iv // 2)
            else:
                iv = min(RECRAWL_MAX_DAYS, iv * 2)
        assert df.loc[i, "n_changes"] == changes
        assert df.loc[i, "interval_days"] == iv
    # AIMD bounds always hold
    assert df["interval_days"].between(RECRAWL_MIN_DAYS, RECRAWL_MAX_DAYS).all()


# ------------------------------------------- crawl_budget_waterfill


def test_waterfill_budget_exact_and_fair(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from europarl_crawler_ray.pipelines.frontier_tools import (
        WF_BUDGET_DEN,
        q_crawl_budget_waterfill,
    )

    # skewed hosts: one mega host, several mid, many tiny
    hosts = [1] * 60 + [2] * 10 + [3] * 10 + [4] * 5 + [5, 6, 7, 8, 9]
    t = pa.table({"o_custkey": pa.array(hosts, pa.int64())})
    pq.write_table(t, tmp_path / "orders.parquet")
    out = q_crawl_budget_waterfill(str(tmp_path)).to_pandas().set_index("host")
    total = len(hosts)
    budget = total // WF_BUDGET_DEN
    # the whole budget is spent, exactly
    assert out["quota"].sum() == budget
    # nobody exceeds their own demand, nobody below level while others above
    assert (out["quota"] <= out["n_urls"]).all()
    level = out["quota"].min()  # tiny hosts (n=1) sit at min(1, T)=1 though
    # fairness: the mega host is capped hard below its demand
    assert out.loc[1, "quota"] < out.loc[1, "n_urls"]
    # hosts with demand <= level are fully satisfied
    small = out[out["n_urls"] <= out.loc[1, "quota"]]
    assert (small["quota"] == small["n_urls"]).all()
