#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line on stdout.

Default: runs the headline crawl+extract pipeline on the synthetic web,
a frontier-dedup microbench (bloom shards), and times every SQL-oracled
query over $GRAFT_SF_DIR (default /root/testdata/sf0.1).

--scaling: runs the headline job in two FRESH processes at N and 4N CPUs
(default 4 and 16 — levels where this host delivers ~4x compute; override
with GRAFT_SCALING_LEVELS=lo,hi) on the same input and reports both
throughputs plus the scaling efficiency (tp_hi/tp_lo)/(hi/lo) and a plain-
multiprocessing hardware control — the sandbox stand-in for the north
rule's N vs 4N cluster criterion. Results land in BENCH/scaling_*.json.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from datetime import date

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# headline crawl window: ~2900 candidate days → ~870 confirmed session days
# × 22 rules ≈ 19k fetched pages in one big wave + small retry waves;
# page_scale enlarges synthetic pages (~15-25 KB html) so fetch+extract
# compute dominates scheduling overhead, as it would at real page sizes
HEADLINE = dict(
    start_date=date(1994, 1, 1),
    today=date(2021, 1, 31),
    discovery_limit=11_000,
    expansion_limit=500_000,
    page_scale=40,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def ray_session(num_cpus: int):
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        # raylet/worker warnings are forwarded to the DRIVER'S STDOUT and
        # would corrupt the single JSON line this script must emit
        log_to_driver=False,
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    return ray


def _warmup():
    """Spin the Ray worker pool once so cold-start cost isn't timed."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    t = pa.table({"x": np.arange(10_000)})
    ray.data.from_arrow(t).repartition(32).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()


def bench_headline(num_cpus: int, out_dir: str) -> dict:
    """Crawl+extract throughput (pages/s) over the synthetic web."""
    import shutil

    from europarl_crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver

    shutil.rmtree(out_dir, ignore_errors=True)
    _warmup()
    cfg = CrawlConfig(
        output_dir=out_dir,
        start_date=HEADLINE["start_date"],
        today=HEADLINE["today"],
        discovery_limit=HEADLINE["discovery_limit"],
        expansion_limit=HEADLINE["expansion_limit"],
        page_scale=HEADLINE["page_scale"],
        num_seen_shards=8,
        seen_exact=False,          # bloom-only at bench scale (10^10 design)
        seen_bits_per_shard=1 << 26,
        # fetch (render ~4ms/page) vs extract+write (~3ms/page): give the
        # actor pool ~55% of CPUs so the downstream task stages keep up —
        # a pool that reserves every CPU starves extract and serializes
        fetch_concurrency=max(2, min(int(num_cpus * 0.55), num_cpus - 2)),
        fetch_batch_size=256,
        checkpoint_every=10**9,    # don't checkpoint inside the timed loop
        # resumable-output granularity: each partition costs ~2-3 s of
        # fixed overhead (pipeline startup + drain straggler), invisible
        # when partitions are hours of work (the 100 TB case) but ~8%/
        # partition at this 30 s bench scale (measured r3: parts 1/2/4/8
        # → 31/34/36/43 s same input). Adaptive: 1 partition per ~250k
        # expected pages, min 1 — so the bench-scale run (~65k pages)
        # uses a single partition and the durability mechanism stays
        # pinned by tests/test_crawl.py kill-and-resume, not by bench.
        stream_partitions=max(1, HEADLINE["discovery_limit"] * 6 // 250_000),
    )
    t0 = time.perf_counter()
    drv = CrawlDriver(cfg, resume=False)
    summary = drv.run_streamed()
    dt = time.perf_counter() - t0
    pages = summary["pages"]
    return {
        "seconds": round(dt, 3),
        "pages": pages,
        "pages_per_sec": round(pages / dt, 1),
        "waves": summary["waves"],
        "confirmed_days": summary["confirmed_days"],
        "seen_size": summary["seen_size"],
    }


def bench_dedup(n_urls: int = 4_000_000, num_shards: int = 8) -> dict:
    """Frontier dedup ops/s: hash + sharded bloom check_and_add."""
    import numpy as np

    from europarl_crawler_ray.functions.canonical import hash_urls
    from europarl_crawler_ray.state.seen import SeenSet

    # deterministic synthetic url corpus with 25% repeats
    base = np.arange(n_urls)
    ids = np.where(base % 4 == 0, base // 2, base)
    urls = np.char.add("https://host.example.org/page/", ids.astype(str)).astype(object)
    seen = SeenSet(num_shards=num_shards, m_bits_per_shard=1 << 27, exact=False)
    t0 = time.perf_counter()
    n_new = 0
    bs = 262_144
    for i in range(0, n_urls, bs):
        h1, h2 = hash_urls(urls[i : i + bs])
        mask = seen.check_and_add(h1, h2)
        n_new += int((~mask).sum())
    dt = time.perf_counter() - t0
    return {
        "seconds": round(dt, 3),
        "urls": n_urls,
        "ops_per_sec": round(n_urls / dt, 0),
        "unique_added": n_new,
    }


def bench_cc_ingest(num_cpus: int, n_urls: int = 60_000) -> dict:
    """Common-Crawl-style multi-host ingest: dedup + politeness + extract
    over a Zipf frontier with 20% duplicate urls."""
    import shutil

    from europarl_crawler_ray.pipelines.cc_ingest import CCIngest, CCIngestConfig

    out = f"/tmp/bench_cc_{num_cpus}"
    shutil.rmtree(out, ignore_errors=True)
    cfg = CCIngestConfig(
        output_dir=out,
        n_urls=n_urls,
        n_hosts=2000,
        n_partitions=4,
        page_scale=10,
        blocks_per_partition=max(8, num_cpus * 2),
    )
    ing = CCIngest(cfg)
    t0 = time.perf_counter()
    s = ing.run()
    dt = time.perf_counter() - t0
    ing.shutdown()
    return {
        "seconds": round(dt, 3),
        "pages": s["pages"],
        "pages_per_sec": round(s["pages"] / dt, 1),
        "unique_urls": s["unique_urls"],
        "est_fpr": s["est_fpr"],
    }


def bench_queries(sf_dir: str) -> dict:
    # the single source of truth for the operator surface — every
    # SQL-oracled entry the driver's correctness gate sees is timed
    # here too (a per-module import list silently under-swept when new
    # family modules landed)
    import __ray_entry__ as entry

    qs, sqls = entry.queries(), entry.oracle_sql()

    # Warm the shared shingle scratch ONCE up front (VERDICT r4 #2):
    # the alphabetical sweep otherwise charges the whole cold corpus-
    # hashing pass to dedup_cascade (~67 s of its in-sweep time) while
    # the rest of the dedup family reuses the parquet scratch for free.
    # The warm cost is surfaced as its own record, not hidden.
    from europarl_crawler_ray.pipelines.ml_queries import _shingle_sets

    t0 = time.perf_counter()
    _shingle_sets(sf_dir)
    scratch_warm_s = round(time.perf_counter() - t0, 3)
    log(f"  shingle scratch warm: {scratch_warm_s}s")

    out = {"_scratch_warm": scratch_warm_s}
    for name, fn in sorted(qs.items()):
        if name not in sqls:  # rows-only ops are not part of the sweep
            continue
        t0 = time.perf_counter()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        out[name] = round(time.perf_counter() - t0, 3)
        log(f"  query {name}: {out[name]}s ({len(res)} rows)")
    return out


def run_full(num_cpus: int, sf_dir: str, skip_queries: bool = False) -> dict:
    ray = ray_session(num_cpus)
    log(f"headline crawl+extract at num_cpus={num_cpus} ...")
    headline = bench_headline(num_cpus, f"/tmp/bench_crawl_{num_cpus}")
    log(f"  {headline}")
    log("dedup microbench ...")
    dedup = bench_dedup()
    log(f"  {dedup}")
    log("cc ingest bench ...")
    cc = bench_cc_ingest(num_cpus)
    log(f"  {cc}")
    queries = {} if skip_queries else bench_queries(sf_dir)
    ray.shutdown()
    # The final stdout line must stay SMALL: the driver captures a fixed-
    # size tail of stdout and parses the last line as JSON — r3's 158-entry
    # per-query dict overflowed that window and the round's bench record
    # came back unparseable ("parsed": null). Full per-query timings go to
    # BENCH/queries_full_latest.json; the line carries a representative
    # subset plus aggregate stats.
    if queries:
        os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
        with open(os.path.join(REPO, "BENCH", "queries_full_latest.json"), "w") as f:
            json.dump({"sf": sf_dir, "num_cpus": num_cpus, "queries": queries}, f, indent=2)
    headline_queries = [
        "url_generation", "nation_order_stats", "dedup_exact", "dedup_minhash",
        "dedup_verify", "corpus_to_shards", "epoch_shuffle", "ann_ivf",
        "pagerank", "bm25_rank", "token_topk", "html_roundtrip",
    ]
    compact = {k: queries[k] for k in headline_queries if k in queries}
    return {
        "metric": "crawl+extract wall time (headline synthetic crawl); "
        "pages_per_sec + dedup ops_per_sec attached",
        "value": headline["seconds"],
        "unit": "sec",
        "queries": compact,
        # total INCLUDES the _scratch_warm entry — the hashing work is
        # still paid, just no longer charged to dedup_cascade's line
        "queries_total_sec": round(sum(queries.values()), 3) if queries else 0.0,
        "n_queries": len([k for k in queries if not k.startswith("_")]),
        "queries_file": "BENCH/queries_full_latest.json" if queries else None,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "headline": headline,
        "dedup": dedup,
        "cc_ingest": cc,
    }


def _hardware_control(levels) -> dict:
    """Plain-multiprocessing CPU scaling of this host — the ceiling any
    engine can reach. This VM shows heavy core-count throttling (e.g. 32
    workers ≈ 18.5 effective cores), so pipeline efficiency must be read
    against this control, not against an ideal 4x."""
    import multiprocessing as mp

    def bench(workers, work=4_000_000, tasks=48):
        with mp.Pool(workers) as p:
            t0 = time.perf_counter()
            p.map(_burn, [work] * tasks)
            return time.perf_counter() - t0

    out = {}
    for w in levels:
        out[str(w)] = round(bench(w), 3)
    lo, hi = levels
    out["control_efficiency"] = round((out[str(lo)] / out[str(hi)]) / (hi / lo), 3)
    return out


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i % 7
    return x


def _steal_pct() -> float:
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(v) for v in parts[1:9]]
        return round(100.0 * vals[7] / max(1, sum(vals)), 2)
    except Exception:
        return -1.0


def run_scaling(sf_dir: str, levels=None) -> dict:
    if levels is None:
        levels = tuple(
            # default N=2 → 4N=8: the host delivers ~4x compute between
            # these levels (control 0.88-0.98) AND the walls are long
            # enough (~200 s / ~55 s) that run-to-run host noise stays
            # small — at 4→16 the 16-cpu wall is ~35-60 s and swung the
            # raw efficiency 0.73-1.02 across r3 repeats (same binary,
            # same input); at 8→32 the host itself caps at 0.58-0.73.
            # See BENCH/BASELINE.md.
            int(x) for x in os.environ.get("GRAFT_SCALING_LEVELS", "2,8").split(",")
        )
    results = {}
    for n in levels:
        log(f"--- scaling run at num_cpus={n} (fresh process) ---")
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n), GRAFT_SF_DIR=sf_dir)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--headline-only"],
            env=env,
            capture_output=True,
            text=True,
            timeout=1800,
        )
        if proc.returncode != 0:
            log(proc.stderr[-4000:])
            raise RuntimeError(f"scaling run at {n} cpus failed")
        results[n] = json.loads(proc.stdout.strip().splitlines()[-1])
    lo, hi = levels
    tp_lo = results[lo]["headline"]["pages_per_sec"]
    tp_hi = results[hi]["headline"]["pages_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    log("hardware control (plain multiprocessing) ...")
    control = _hardware_control(levels)
    out = {
        "metric": f"scaling efficiency {lo}->{hi} cpus (pages/s ratio / {hi / lo:g})",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": sf_dir,
        "levels": {
            str(lo): {"pages_per_sec": tp_lo, "seconds": results[lo]["headline"]["seconds"]},
            str(hi): {"pages_per_sec": tp_hi, "seconds": results[hi]["headline"]["seconds"]},
        },
        "dedup_ops_per_sec": {
            str(lo): results[lo]["dedup"]["ops_per_sec"],
            str(hi): results[hi]["dedup"]["ops_per_sec"],
        },
        # the host's own scaling ceiling between the same two levels,
        # measured with plain multiprocessing (no Ray): pipeline efficiency
        # should be compared against this, not an ideal 1.0
        "hardware_control": control,
        "pipeline_vs_hardware": round(eff / max(control["control_efficiency"], 1e-9), 3),
        "cpu_steal_pct": _steal_pct(),
        # same-window-control discipline (institutionalized per VERDICT r3
        # #10): a control below the host's quiet-window band means the
        # raw efficiency is a contention artifact — read
        # pipeline_vs_hardware instead and re-run for a clean reading
        "window": "loaded" if control["control_efficiency"] < 0.8 else "quiet",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_latest.json"), "w") as f:
        json.dump(out, f, indent=2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--headline-only", action="store_true")
    args = ap.parse_args()
    # Ray's raylet forwards warnings to the driver's fd 1 even with
    # log_to_driver=False, which would corrupt the single JSON line this
    # script must emit. Park the real stdout on a spare fd, point fd 1 at
    # stderr for the whole run (child processes inherit it), and write the
    # JSON to the saved fd at the end.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    sys.stdout = sys.stderr
    try:
        if args.scaling:
            out = run_scaling(SF_DIR)
        else:
            out = run_full(NUM_CPUS, SF_DIR, skip_queries=args.headline_only)
    finally:
        sys.stdout = sys.__stdout__
    os.write(real_stdout, (json.dumps(out) + "\n").encode())


if __name__ == "__main__":
    main()
