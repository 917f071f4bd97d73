"""CLI — the rebuild of the reference's ``eurocli`` entry points
(``/root/reference/europarl/eurocli.py``): crawler / postprocessing /
indexing lifecycles plus status, as argparse subcommands.

Usage (module form):
    python -m europarl_crawler_ray.cli crawl --out /tmp/crawl \
        --start 2021-01-04 --today 2021-03-01 [--streamed]
    python -m europarl_crawler_ray.cli postprocess --pages /tmp/crawl/pages --out /tmp/index
    python -m europarl_crawler_ray.cli reprocess --pages /tmp/crawl/pages \
        --out /tmp/index --rule protocol_en_html
    python -m europarl_crawler_ray.cli status --out /tmp/crawl

Owns its Ray session (guarded — never re-inits a driver-owned session).
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date


def _ray_session(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def cmd_crawl(args) -> int:
    from .pipelines.crawl import CrawlConfig, CrawlDriver

    ray = _ray_session(args.num_cpus)
    cfg = CrawlConfig(
        output_dir=args.out,
        start_date=date.fromisoformat(args.start),
        today=date.fromisoformat(args.today),
        offset_days=args.offset_days,
        discovery_limit=args.discovery_limit,
        expansion_limit=args.expansion_limit,
        simulated_politeness=not args.real_politeness,
        min_interval=args.min_interval,
        fetch_concurrency=args.fetch_concurrency,
        seen_exact=not args.bloom_only,
        max_waves=args.max_waves,
        stream_partitions=args.stream_partitions,
    )
    driver = CrawlDriver(cfg, resume=not args.fresh)
    summary = driver.run_streamed() if args.streamed else driver.run()
    print(json.dumps(summary))
    ray.shutdown()
    return 0


def cmd_postprocess(args) -> int:
    from .pipelines.postprocess import postprocess

    ray = _ray_session(args.num_cpus)
    path = postprocess(args.pages, args.out, reextract=args.reextract)
    print(json.dumps({"published": path}))
    ray.shutdown()
    return 0


def cmd_reprocess(args) -> int:
    from .functions.rules import RULES_BY_NAME
    from .pipelines.postprocess import reprocess_by_rule

    if args.rule not in RULES_BY_NAME:
        print(f"error: unknown rule '{args.rule}' (see the 'rules' subcommand)",
              file=sys.stderr)
        return 2
    ray = _ray_session(args.num_cpus)
    path = reprocess_by_rule(args.pages, args.out, args.rule)
    print(json.dumps({"published": path}))
    ray.shutdown()
    return 0


def cmd_status(args) -> int:
    import os

    from .pipelines.postprocess import latest_version

    manifest = os.path.join(args.out, "manifest.json")
    out = {}
    if os.path.exists(manifest):
        with open(manifest) as f:
            doc = json.load(f)
        st = doc["state"]
        out["crawl"] = {
            "wave": st["wave"],
            "probed_done": len(st["probed_done"]),
            "confirmed": len(st["confirmed"]),
            "retry": len(st["retry"]),
            "metrics": doc["metrics"][-3:],
        }
    v = latest_version(args.out)
    if v is not None:
        out["index_version"] = v
    print(json.dumps(out))
    return 0


def cmd_ccingest(args) -> int:
    from .pipelines.cc_ingest import CCIngest, CCIngestConfig

    ray = _ray_session(args.num_cpus)
    ing = CCIngest(
        CCIngestConfig(
            output_dir=args.out,
            n_urls=args.n_urls,
            n_hosts=args.n_hosts,
            n_partitions=args.partitions,
        )
    )
    print(json.dumps(ing.run()))
    ing.shutdown()
    ray.shutdown()
    return 0


def cmd_rules(args) -> int:
    from .functions.rules import RULES

    for r in RULES:
        print(f"{r.name:28s} {r.prefix:3s} {r.infix or '-':3s} {r.language} {r.format}")
    return 0


def cmd_query(args) -> int:
    """Run any registered operator by name over an sf table directory —
    the whole queries() surface without writing a script."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__ray_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    qs = entry.queries()
    if args.list or args.name is None:
        for name in sorted(qs):
            print(name)
        return 0
    if args.name not in qs:
        print(f"unknown query {args.name!r} (see --list)", file=sys.stderr)
        return 2
    _ray_session(getattr(args, "num_cpus", 8))
    res = qs[args.name](args.sf)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    if args.out:
        res.to_parquet(args.out, index=False)
        print(f"{len(res)} rows -> {args.out}")
    else:
        with __import__("pandas").option_context(
            "display.max_rows", args.head, "display.width", 200
        ):
            print(res.head(args.head))
        print(f"[{len(res)} rows]")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="europarl-crawler-ray")
    p.add_argument("--num-cpus", type=int, default=8)
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the wave crawl (or --streamed)")
    c.add_argument("--out", required=True)
    c.add_argument("--start", default="2021-01-04")
    c.add_argument("--today", default="2021-03-01")
    c.add_argument("--offset-days", type=int, default=30)
    c.add_argument("--discovery-limit", type=int, default=10)
    c.add_argument("--expansion-limit", type=int, default=50)
    c.add_argument("--min-interval", type=float, default=3.0)
    c.add_argument("--fetch-concurrency", type=int, default=4)
    c.add_argument("--max-waves", type=int, default=None)
    c.add_argument("--streamed", action="store_true")
    c.add_argument("--stream-partitions", type=int, default=8,
                   help="resumable pages/part=K granularity in --streamed mode")
    c.add_argument("--fresh", action="store_true", help="ignore existing manifest")
    c.add_argument("--real-politeness", action="store_true",
                   help="wall-clock token buckets (sleeps) instead of simulated")
    c.add_argument("--bloom-only", action="store_true")
    c.set_defaults(fn=cmd_crawl)

    pp = sub.add_parser("postprocess", help="pages parquet → versioned index docs")
    pp.add_argument("--pages", required=True)
    pp.add_argument("--out", required=True)
    pp.add_argument("--reextract", action="store_true")
    pp.set_defaults(fn=cmd_postprocess)

    rp = sub.add_parser("reprocess", help="recompute one rule, publish new version")
    rp.add_argument("--pages", required=True)
    rp.add_argument("--out", required=True)
    rp.add_argument("--rule", required=True)
    rp.set_defaults(fn=cmd_reprocess)

    st = sub.add_parser("status", help="crawl/index state from manifests")
    st.add_argument("--out", required=True)
    st.set_defaults(fn=cmd_status)

    rl = sub.add_parser("rules", help="list the rule registry")
    rl.set_defaults(fn=cmd_rules)

    cc = sub.add_parser("ccingest", help="Common-Crawl-style multi-host ingest")
    cc.add_argument("--out", required=True)
    cc.add_argument("--n-urls", type=int, default=100_000)
    cc.add_argument("--n-hosts", type=int, default=1000)
    cc.add_argument("--partitions", type=int, default=16)
    cc.set_defaults(fn=cmd_ccingest)

    q = sub.add_parser("query", help="run a registered operator over an sf dir")
    q.add_argument("name", nargs="?", help="operator name (omit with --list)")
    q.add_argument("--sf", default="/root/testdata/sf0.001")
    q.add_argument("--out", help="write result parquet here instead of printing")
    q.add_argument("--head", type=int, default=20)
    q.add_argument("--list", action="store_true", help="list operator names")
    q.set_defaults(fn=cmd_query)

    # --num-cpus also accepted AFTER the subcommand (as the README shows);
    # SUPPRESS keeps the top-level value when the sub-position flag is absent
    for spp in (c, pp, rp, st, rl, cc, q):
        spp.add_argument("--num-cpus", type=int, default=argparse.SUPPRESS)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
