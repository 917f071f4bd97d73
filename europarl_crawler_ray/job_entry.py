"""`ray job submit` entrypoint — the cluster launch path.

The production invocation on a fixed-size cluster (N or 4N nodes):

    ray job submit --address http://<head>:8265 \\
        --working-dir . -- \\
        python -m europarl_crawler_ray.job_entry \\
            --pipeline cc_ingest --out /mnt/shared/crawl_run \\
            --n-urls 10000000000 --n-partitions 4096

The job connects to the EXISTING cluster (``ray.init(address="auto")``
inside the job's driver), runs the requested pipeline with partitioned,
manifest-tracked output, and prints ONE JSON metrics line to stdout
(captured by ``ray job logs``). Re-submitting the same job after a
failure resumes from the manifest — only unfinished partitions re-run.

This module is a SCRIPT entrypoint: it owns its Ray session (guarded),
unlike the library code which never calls ``ray.init``. Locally it runs
against ``RAY_ADDRESS=local``, which is how the test exercises it
end-to-end without a job server (the sandbox has no dashboard; the
``ray job submit`` wrapper adds only transport, not semantics).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="europarl-crawler-ray-job")
    p.add_argument(
        "--pipeline",
        choices=["flagship", "cc_ingest", "streamed"],
        default="cc_ingest",
    )
    p.add_argument("--out", required=True)
    p.add_argument("--n-urls", type=int, default=100_000)
    p.add_argument("--n-partitions", type=int, default=16)
    p.add_argument("--max-partitions", type=int, default=None)
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        address = os.environ.get("RAY_ADDRESS", "auto")
        kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
        # num_cpus is only legal when STARTING a local Ray (ray.init
        # rejects it when attaching to an existing cluster — the cluster
        # defines its own resources); drop it with a note otherwise
        if args.num_cpus is not None:
            if address == "local":
                kwargs["num_cpus"] = args.num_cpus
            else:
                print(
                    f"note: --num-cpus ignored when attaching to '{address}'",
                    file=sys.stderr,
                )
        ray.init(address=address, **kwargs)

    t0 = time.time()
    if args.pipeline == "flagship":
        from europarl_crawler_ray.pipelines.flagship import run_flagship

        pages = run_flagship(output_dir=args.out)
        stats = {"pages": pages.count()}
    elif args.pipeline == "streamed":
        from datetime import date

        from europarl_crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver

        cfg = CrawlConfig(
            output_dir=args.out,
            start_date=date(2021, 1, 4),
            today=date(2021, 2, 1),
            discovery_limit=10,
            expansion_limit=100,
        )
        drv = CrawlDriver(cfg)
        stats = drv.run_streamed()
    else:
        from europarl_crawler_ray.pipelines.cc_ingest import (
            CCIngest,
            CCIngestConfig,
        )

        ing = CCIngest(
            CCIngestConfig(
                output_dir=args.out,
                n_urls=args.n_urls,
                n_partitions=args.n_partitions,
            )
        )
        stats = ing.run(max_partitions=args.max_partitions)

    out = {
        "pipeline": args.pipeline,
        "out": args.out,
        "seconds": round(time.time() - t0, 3),
        "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
        "stats": stats,
    }
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
