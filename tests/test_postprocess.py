"""Postprocess / versioned index pipeline (E4-E6, F5-F7, S7)."""

import json
import os
from datetime import date

import pyarrow.dataset as pads
import pytest

from europarl_crawler_ray.pipelines.crawl import CrawlConfig, CrawlDriver
from europarl_crawler_ray.pipelines.postprocess import (
    latest_version,
    postprocess,
    reprocess_by_rule,
)


@pytest.fixture(scope="module")
def crawl_pages(ray_session, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pp") / "crawl")
    cfg = CrawlConfig(
        output_dir=out,
        start_date=date(2021, 2, 1),
        today=date(2021, 3, 10),
        offset_days=5,
        discovery_limit=20,
        expansion_limit=500,
        num_seen_shards=2,
        fetch_concurrency=2,
    )
    CrawlDriver(cfg, resume=False).run()
    return out


def test_postprocess_publishes_versioned_index(crawl_pages, tmp_path):
    out = str(tmp_path / "index")
    path = postprocess(f"{crawl_pages}/pages", out)
    assert path.endswith("v00001")
    assert latest_version(out) == 1
    docs = pads.dataset(path).to_table()
    cols = set(docs.column_names)
    # the europarl_index.json record shape (SURVEY §1.1)
    assert {"url", "downloaded_at", "filesize", "filetype", "content",
            "language", "rulename", "session_date"} <= cols
    # only fetched (200) rows become index docs, html rows carry content
    assert docs.num_rows > 0
    html_rows = [r for r in docs.to_pylist() if r["filetype"] == ".html"]
    assert html_rows and all(r["content"] for r in html_rows)
    with open(os.path.join(out, "v00001.manifest.json")) as f:
        m = json.load(f)
    assert m["rows"] == docs.num_rows


def test_postprocess_rerun_is_idempotent_new_version(crawl_pages, tmp_path):
    out = str(tmp_path / "index")
    p1 = postprocess(f"{crawl_pages}/pages", out)
    p2 = postprocess(f"{crawl_pages}/pages", out)
    t1 = pads.dataset(p1).to_table().sort_by("url")
    t2 = pads.dataset(p2).to_table().sort_by("url")
    assert latest_version(out) == 2
    assert t1.equals(t2)


def test_reprocess_by_rule_only_touches_that_rule(crawl_pages, tmp_path):
    out = str(tmp_path / "index")
    postprocess(f"{crawl_pages}/pages", out)
    path = reprocess_by_rule(f"{crawl_pages}/pages", out, "protocol_en_html")
    assert latest_version(out) == 2
    v1 = pads.dataset(os.path.join(out, "v00001")).to_table()
    v2 = pads.dataset(path).to_table()
    assert v2.num_rows == v1.num_rows
    # recomputed rule rows are byte-identical (extraction is deterministic)
    a = {r["url"]: r["content"] for r in v1.to_pylist()}
    b = {r["url"]: r["content"] for r in v2.to_pylist()}
    assert a == b


def test_ensure_text_keeps_column_order_uniform(ray_session, crawl_pages):
    """ADVICE r2: a block where some rows need re-extraction must come out
    with the SAME column order as a block where none do — one dataset must
    not mix physical schemas."""
    import pyarrow as pa
    import ray.data

    from europarl_crawler_ray.pipelines.postprocess import make_ensure_text

    src = ray.data.read_parquet(f"{crawl_pages}/pages").to_pandas().head(8)
    assert src["text"].notna().any()
    mixed = src.copy()
    mixed.loc[mixed.index[:3], "text"] = None  # this block re-extracts 3 rows
    fn = make_ensure_text()
    clean_out = fn(pa.Table.from_pandas(src, preserve_index=False))
    mixed_out = fn(pa.Table.from_pandas(mixed, preserve_index=False))
    assert clean_out.column_names == mixed_out.column_names
    # the re-extracted rows actually got text back
    assert mixed_out.column("text").null_count < 3


def test_failed_publish_leaves_previous_version_current(
    crawl_pages, tmp_path, monkeypatch
):
    """VERDICT r3 missing #2: a publish that dies mid-write (either during
    the parquet write or between the data rename and the manifest write)
    must leave latest_version pointing at the previous COMPLETE version;
    the retry then lands cleanly under the next number."""
    import europarl_crawler_ray.pipelines.postprocess as pp

    out = str(tmp_path / "index")
    pages = f"{crawl_pages}/pages"
    postprocess(pages, out)
    assert latest_version(out) == 1
    v1_rows = pads.dataset(os.path.join(out, "v00001")).count_rows()

    # --- failure INSIDE the data write: tmp dir partial, no rename ---
    import europarl_crawler_ray._util as util

    real_write = util.atomic_write_parquet

    def boom(ds, final_dir, **kw):
        os.makedirs(final_dir + "__tmp", exist_ok=True)  # partial debris
        raise OSError("disk full")

    monkeypatch.setattr(util, "atomic_write_parquet", boom)
    with pytest.raises(OSError):
        postprocess(pages, out)
    monkeypatch.undo()
    assert latest_version(out) == 1  # debris is not a version

    # --- failure AFTER the data rename, BEFORE the manifest lands ---
    def write_then_die(ds, final_dir, **kw):
        rows = real_write(ds, final_dir, **kw)
        raise OSError("node lost before manifest")
        return rows

    monkeypatch.setattr(util, "atomic_write_parquet", write_then_die)
    with pytest.raises(OSError):
        postprocess(pages, out)
    monkeypatch.undo()
    # orphan v00002 data dir exists but has no manifest: invisible
    assert os.path.isdir(os.path.join(out, "v00002"))
    assert latest_version(out) == 1

    # --- retry: overwrites the orphan under the same number, commits ---
    path = postprocess(pages, out)
    assert path.endswith("v00002")
    assert latest_version(out) == 2
    assert pads.dataset(path).count_rows() == v1_rows
    with open(os.path.join(out, "v00002.manifest.json")) as f:
        assert json.load(f)["version"] == 2
