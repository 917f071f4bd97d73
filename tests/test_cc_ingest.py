"""CC-style ingest: dedup across partitions, partition-level resume,
extracted text correctness for generic pages."""

import pyarrow.dataset as pads
import pytest

from europarl_crawler_ray.pipelines.cc_ingest import CCIngest, CCIngestConfig


def _cfg(tmp_path, **kw):
    return CCIngestConfig(
        output_dir=str(tmp_path / "cc"),
        n_urls=4000,
        n_hosts=50,
        n_partitions=4,
        num_seen_shards=2,
        seen_bits_per_shard=1 << 20,
        n_politeness_shards=2,
        blocks_per_partition=4,
        **kw,
    )


def test_ingest_dedups_across_partitions(ray_session, tmp_path):
    ing = CCIngest(_cfg(tmp_path))
    s = ing.run()
    assert s["partitions_done"] == 4
    pages = pads.dataset(str(tmp_path / "cc")).to_table(columns=["url"])
    urls = pages.column("url").to_pylist()
    # every fetched url is unique — dup injections were filtered by the
    # seen shards even across partition boundaries
    assert len(urls) == len(set(urls))
    assert s["pages"] == len(urls)
    assert s["unique_urls"] == len(urls)
    assert s["est_fpr"] < 1e-3
    ing.shutdown()


def test_ingest_resume_skips_done_partitions(ray_session, tmp_path):
    cfg = _cfg(tmp_path)
    ing = CCIngest(cfg)
    ing.run(max_partitions=2)  # "crash" after two durable partitions
    assert len(ing._done()) == 2
    ing.shutdown()
    ing2 = CCIngest(cfg)  # fresh actors; seen-set restored from checkpoint
    s = ing2.run()
    assert s["partitions_skipped_on_resume"] == 2
    assert s["partitions_done"] == 4
    pages = pads.dataset(str(tmp_path / "cc")).to_table(columns=["url"])
    urls = pages.column("url").to_pylist()
    # seen checkpoint restored on resume → dedup stays consistent across
    # the restart: no url fetched twice, even across the crash boundary
    assert len(urls) == len(set(urls))
    ing2.shutdown()


def test_ingest_extracted_text_matches_kernel(ray_session, tmp_path):
    from europarl_crawler_ray.functions.extract import html_to_text

    ing = CCIngest(_cfg(tmp_path))
    ing.run()
    pages = pads.dataset(str(tmp_path / "cc")).to_table(
        columns=["url", "status_code", "html", "text"]
    )
    checked = 0
    for r in pages.to_pylist()[:200]:
        if r["status_code"] == 200 and r["html"]:
            assert r["text"] == html_to_text(r["html"])
            checked += 1
    assert checked > 50
    ing.shutdown()
