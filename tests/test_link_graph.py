"""Outlink extraction (LinkExtractor) + link_graph degree aggregation.
Oracle parity is covered by the gate; these pin the parser's DOM
semantics (decoys) and the degree bookkeeping on a tiny corpus."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from europarl_crawler_ray.functions.extract import extract_hrefs
from europarl_crawler_ray.pipelines.queries import (
    _link_targets,
    _render_link_page,
    q_link_graph,
)


def test_extractor_skips_comment_and_script_decoys():
    html = _render_link_page(7, [1, 2, 3])
    hrefs = extract_hrefs(html)
    assert "/doc/999999" not in hrefs  # script CDATA decoy
    assert "/doc/888888" not in hrefs  # commented-out decoy
    assert [h for h in hrefs if h.startswith("/doc/")] == ["/doc/1", "/doc/2", "/doc/3"]
    assert any(h.startswith("https://") for h in hrefs)  # external IS parsed


def test_extractor_handles_self_closing_and_missing_href():
    assert extract_hrefs('<a name="x">t</a><a href="/doc/4"/><a href="/doc/5">y</a>') == [
        "/doc/4",
        "/doc/5",
    ]


def test_degrees_on_tiny_corpus(ray_session, tmp_path):
    n = 6
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
    df = q_link_graph(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # expected degrees straight from the target formula
    out_exp = {i: len(_link_targets(i, n)) for i in range(n)}
    in_exp = {i: 0 for i in range(n)}
    for i in range(n):
        for dst in _link_targets(i, n):
            in_exp[dst] += 1
    assert df["out_degree"].to_dict() == out_exp
    assert df["in_degree"].to_dict() == in_exp
    assert df["out_degree"].between(1, 4).all()


# ------------------------------------------------- anchor-text indexing


def test_anchor_extractor_text_semantics():
    from europarl_crawler_ray.functions.extract import extract_anchors

    html = (
        '<script>var d = \'<a href="/doc/9">decoy</a>\';</script>'
        "<!-- <a href=\"/doc/8\">gone</a> -->"
        '<a href="/doc/1">doc 1 ref&#32;3</a>'
        '<a href="/doc/2">one <b>bold</b> label</a>'
        '<a href="/doc/3">first'          # implicit close by next <a>
        '<a href="/doc/4"/>'               # self-closing: empty text
        '<a name="x">no href</a>'
    )
    assert extract_anchors(html) == [
        ("/doc/1", "doc 1 ref 3"),   # charref converted
        ("/doc/2", "one bold label"),
        ("/doc/3", "first"),
        ("/doc/4", ""),
    ]


def test_anchor_texts_on_tiny_corpus(ray_session, tmp_path):
    from europarl_crawler_ray.pipelines.queries import q_anchor_texts

    n = 6
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
    df = q_anchor_texts(str(tmp_path)).to_pandas().set_index("doc_id").sort_index()
    # brute force from the target formula + the label rule
    labels: dict[int, dict[str, int]] = {}
    for src in range(n):
        for dst in _link_targets(src, n):
            lab = f"doc {dst} ref {src % 7}"
            labels.setdefault(dst, {})
            labels[dst][lab] = labels[dst].get(lab, 0) + 1
    assert set(df.index) == set(labels)
    for dst, hist in labels.items():
        assert df.loc[dst, "n_anchors"] == sum(hist.values())
        assert df.loc[dst, "n_distinct_texts"] == len(hist)
        best = sorted(hist.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        assert df.loc[dst, "top_text"] == best


def test_internal_edges_np_matches_render_parse_walk():
    """VERDICT r3 #4: the vectorized edge walk must emit the IDENTICAL
    (src, dst) multiset as the render -> DOM-parse -> /doc filter walk,
    including self-loops, duplicate targets, and the md5 out-degree rule
    — in the same order."""
    import numpy as np

    from europarl_crawler_ray.pipelines.queries import (
        internal_edges_np,
        iter_internal_edges,
    )

    for n_docs in (1, 2, 7, 97, 500):
        ids = list(range(min(n_docs, 120)))
        slow = list(iter_internal_edges(ids, n_docs))
        src, dst = internal_edges_np(ids, n_docs)
        assert list(zip(src.tolist(), dst.tolist())) == slow, n_docs
        # drop_self + counts variants stay consistent with the base walk
        s2, d2 = internal_edges_np(ids, n_docs, drop_self=True)
        assert [(a, b) for a, b in slow if a != b] == list(zip(s2.tolist(), d2.tolist()))
        s3, d3, deg = internal_edges_np(ids, n_docs, return_counts=True)
        assert (s3 == src).all() and (d3 == dst).all()
        outdeg = {a: 0 for a, _ in slow}
        for a, _ in slow:
            outdeg[a] += 1
        assert [outdeg[a] for a in s3.tolist()] == deg.tolist()

    # empty inputs
    for args in ((np.array([], dtype=np.int64), 10), ([1, 2, 3], 0)):
        s, d = internal_edges_np(*args)
        assert len(s) == 0 and len(d) == 0
