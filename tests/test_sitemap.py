"""Sitemap XML codec + sitemap_frontier semantics: scanning-parser DOM
rules (comments, declaration, entities), render round trip, index→shard
fan-out, seen-diff. Oracle parity is covered by the gate."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.functions.dedup import md5_hash64
from europarl_crawler_ray.functions.sitemap import (
    parse_sitemap,
    render_sitemap_index,
    render_urlset,
    xml_escape,
    xml_unescape,
)


def test_unescape_entities():
    assert xml_unescape("a&amp;b &lt;x&gt; &quot;q&quot; &apos;s&apos;") == "a&b <x> \"q\" 's'"
    assert xml_unescape("&#65;&#x42;") == "AB"
    assert xml_unescape("no refs") == "no refs"
    assert xml_unescape("&bogus; &#65") == "&bogus; &#65"  # lenient


def test_parse_skips_comments_and_decl():
    xml = (
        '<?xml version="1.0"?>\n'
        "<!-- <url><loc>https://decoy.example/x</loc></url> -->\n"
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.example/p?x=1&amp;y=2</loc>"
        "<lastmod>2024-02-03</lastmod></url>\n"
        "<url><loc> https://b.example/q </loc></url>\n"
        "</urlset>"
    )
    root, entries = parse_sitemap(xml)
    assert root == "urlset"
    assert entries == [
        ("https://a.example/p?x=1&y=2", "2024-02-03"),
        ("https://b.example/q", None),  # whitespace stripped, no lastmod
    ]


def test_parse_sitemapindex_and_errors():
    root, entries = parse_sitemap(render_sitemap_index(["https://h/s_0.xml", "https://h/s_1.xml"]))
    assert root == "sitemapindex"
    assert [e[0] for e in entries] == ["https://h/s_0.xml", "https://h/s_1.xml"]
    with pytest.raises(ValueError):
        parse_sitemap("<html><body>not a sitemap</body></html>")
    with pytest.raises(ValueError):
        parse_sitemap("<urlset><url><lastmod>2024-01-01</lastmod></url></urlset>")


def test_render_parse_roundtrip():
    entries = [
        ("https://h.example/a?x=1&y=<2>", "2024-05-06"),
        ("https://h.example/plain", None),
    ]
    assert parse_sitemap(render_urlset(entries)) == ("urlset", entries)
    assert "&amp;" in render_urlset(entries) and "&lt;" in render_urlset(entries)


def test_sitemap_frontier_tiny_corpus(ray_session, tmp_path, monkeypatch):
    import europarl_crawler_ray.pipelines.frontier_tools as ft

    monkeypatch.setattr(ft, "SITEMAP_URLS_PER_SHARD", 2)  # force multi-shard fan-out
    n = 40
    t = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["x"] * n),
            "lang": pa.array(["en"] * n),
            "source": pa.array(["s"] * n),
            "n_chars": pa.array([1] * n, pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    df = ft.q_sitemap_frontier(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    seen = md5_hash64([f"seen:{i}" for i in range(n)]) % np.uint64(3) == 0
    want_ids = [i for i in range(n) if not seen[i]]
    assert list(df.index) == want_ids
    for i in want_ids:
        g = i % ft.SITEMAP_N_HOSTS
        assert df.loc[i, "host"] == f"site{g}.example"
        url = df.loc[i, "url"]
        assert url.startswith(f"https://site{g}.example/doc/{i}")
        assert ("?ref=idx&v=2" in url) == (i % 5 == 0)
        import datetime

        want = (datetime.date(2024, 1, 1) + datetime.timedelta(days=i % 365)).isoformat()
        assert df.loc[i, "lastmod"] == want
