"""Common-Crawl-style ingest — the BASELINE.json metric workload.

A multi-host, Zipf-skewed url frontier streamed through:

    frontier partition → seen-set dedup (sharded bloom actors)
    → politeness-gated fetch (per-host leases + robots, hot-host aware)
    → extract (byte-exact html→text) → pages Parquet

Output is PARTITIONED (``part=K/``) with a manifest listing finished
partitions; a restarted run skips them (resumable output — a failed 100 TB
run re-does only the partition in flight). Each partition is one lazy
Dataset pipeline; partitions stream sequentially so the object store never
holds more than one partition's pages.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .._util import atomic_write_parquet
from ..functions.canonical import hash_urls
from ..sources.synth import cc_urls
from ..stages.extract import extract_batch
from ..stages.fetch import Fetcher
from ..state.politeness import PolitenessCoordinator
from ..state.seen import SeenSet


@dataclass
class CCIngestConfig:
    output_dir: str
    n_urls: int = 100_000
    n_hosts: int = 1000
    zipf_a: float = 1.3
    n_partitions: int = 16
    seed: int = 42
    page_scale: int = 1
    dup_fraction: float = 0.2     # fraction of frontier urls that repeat
    num_seen_shards: int = 8
    seen_bits_per_shard: int = 1 << 26
    n_politeness_shards: int = 2
    fetch_batch_size: int = 512
    blocks_per_partition: int = 32


class CCIngest:
    def __init__(self, cfg: CCIngestConfig):
        self.cfg = cfg
        self.seen = SeenSet(
            num_shards=cfg.num_seen_shards,
            m_bits_per_shard=cfg.seen_bits_per_shard,
            exact=False,
            # shard actors auto-restart and reload this checkpoint on
            # failure (bounded at-least-once — see state/seen.py)
            checkpoint_dir=os.path.join(cfg.output_dir, "_seen"),
        )
        self.coords = [
            PolitenessCoordinator.options(num_cpus=0).remote(simulated=True)
            for _ in range(cfg.n_politeness_shards)
        ]
        os.makedirs(cfg.output_dir, exist_ok=True)
        # host of url i is a pure function of i — computed ONCE, not per
        # partition (review finding: regenerating the full zipf array per
        # partition was O(n_urls * n_partitions))
        self._all_hosts = np.minimum(
            np.random.default_rng(cfg.seed).zipf(cfg.zipf_a, size=cfg.n_urls) - 1,
            cfg.n_hosts - 1,
        )
        # resume: restore the seen-set checkpoint so dedup is consistent
        # across restarts (urls fetched by finished partitions stay seen)
        seen_dir = os.path.join(cfg.output_dir, "_seen")
        if self._done() and os.path.exists(seen_dir):
            self.seen.restore(seen_dir)

    # ------------------------------------------------------------ frontier
    def _partition_urls(self, p: int) -> np.ndarray:
        """Deterministic frontier slice for partition p, with injected
        repeats (dedup food) referencing urls from ANY partition."""
        cfg = self.cfg
        chunk = cfg.n_urls // cfg.n_partitions
        lo = p * chunk
        # final partition absorbs the remainder — otherwise the last
        # n_urls % n_partitions frontier urls would silently never ingest
        hi = cfg.n_urls if p == cfg.n_partitions - 1 else lo + chunk
        rng = np.random.default_rng(cfg.seed + 1000 + p)
        ids = np.arange(lo, hi)
        dup_mask = rng.random(len(ids)) < cfg.dup_fraction
        ids[dup_mask] = rng.integers(0, cfg.n_urls, size=int(dup_mask.sum()))
        all_hosts = self._all_hosts  # host depends only on the url id
        return np.array(
            [f"https://host{all_hosts[i]:05d}.example.org/page/{i}" for i in ids],
            dtype=object,
        )

    # ------------------------------------------------------------ manifest
    def _manifest_path(self) -> str:
        return os.path.join(self.cfg.output_dir, "_cc_manifest.json")

    def _manifest(self) -> dict:
        if not os.path.exists(self._manifest_path()):
            return {"done_partitions": [], "lineage": {}}
        with open(self._manifest_path()) as f:
            doc = json.load(f)
        doc.setdefault("lineage", {})
        return doc

    def _done(self) -> set[int]:
        return set(self._manifest()["done_partitions"])

    def _mark_done(self, p: int, lineage: dict) -> None:
        doc = self._manifest()
        doc["done_partitions"] = sorted(set(doc["done_partitions"]) | {p})
        doc["lineage"][str(p)] = lineage  # per-partition lineage + metrics
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(doc, f)
        os.replace(tmp, self._manifest_path())

    # ------------------------------------------------------------ pipeline
    def run(self, max_partitions: int | None = None) -> dict:
        cfg = self.cfg
        seen = self.seen
        coords = self.coords
        n_pages = 0
        n_skipped = 0
        ran = 0
        for p in range(cfg.n_partitions):
            if p in self._done():
                n_skipped += 1
                continue
            if max_partitions is not None and ran >= max_partitions:
                break
            urls = self._partition_urls(p)
            t = pa.table({"url": pa.array(urls.tolist(), pa.string())})
            step = max(1, (t.num_rows + cfg.blocks_per_partition - 1) // cfg.blocks_per_partition)
            ds = ray.data.from_arrow(
                [t.slice(i, step) for i in range(0, t.num_rows, step)]
            )

            def dedup(batch: pa.Table) -> pa.Table:
                h1, h2 = hash_urls(batch.column("url").to_pylist())
                dup = seen.check_and_add(h1, h2)
                return batch.filter(pa.array(~dup))

            def to_frontier(batch: pa.Table) -> pa.Table:
                n = batch.num_rows
                return pa.table(
                    {
                        "url": batch.column("url"),
                        "rulename": pa.array(["cc"] * n, pa.string()),
                        "date": pa.array([None] * n, pa.date32()),
                        "attempt": pa.array([0] * n, pa.int32()),
                        "wave": pa.array([p] * n, pa.int32()),
                    }
                )

            seed, scale = cfg.seed, cfg.page_scale

            def fetch_fn(batch: pa.Table) -> pa.Table:
                return Fetcher(
                    coordinator=coords, seed=seed, simulated=True, page_scale=scale
                )(batch)

            ds = ds.map_batches(dedup, batch_format="pyarrow", num_cpus=0.25)
            ds = ds.map_batches(to_frontier, batch_format="pyarrow", num_cpus=0.25)
            ds = ds.map_batches(
                fetch_fn, batch_format="pyarrow", batch_size=cfg.fetch_batch_size, num_cpus=1
            )
            ds = ds.map_batches(
                lambda t: extract_batch(t, default_filetype=".html"),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            part_dir = os.path.join(cfg.output_dir, f"part={p}")
            # keep_existing_if_empty: if a restored seen-set dedups every
            # url of a partition that is already durable on disk, the old
            # data must NOT be replaced by an empty write (review finding)
            part_rows = atomic_write_parquet(ds, part_dir, keep_existing_if_empty=True)
            n_pages += part_rows
            # COMMIT ORDER: durable data → manifest → seen checkpoint. A
            # crash after _mark_done but before checkpoint can only cause
            # bounded duplicate re-admission in LATER partitions; the old
            # order (checkpoint before mark) could erase a durable
            # partition on resume (review finding).
            self._mark_done(
                p,
                {
                    "input_urls": int(len(urls)),
                    "pages": int(part_rows),
                    "path": part_dir,
                    "seed": cfg.seed,
                },
            )
            self.seen.checkpoint(os.path.join(cfg.output_dir, "_seen"))
            ran += 1
        stats = seen.stats()
        return {
            "partitions_done": len(self._done()),
            "partitions_skipped_on_resume": n_skipped,
            "pages": n_pages,
            "unique_urls": stats["n_added"],
            "est_fpr": stats["est_fpr"],
        }

    def shutdown(self) -> None:
        for a in self.coords:
            ray.kill(a, no_restart=True)
        for a in self.seen.shards:
            ray.kill(a, no_restart=True)
